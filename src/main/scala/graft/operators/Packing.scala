package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.Text.{hash60, tokens}

/** Sequence packing: lay documents head-to-tail in a deterministic order and
  * cut the stream into fixed-length training sequences — every doc gets
  * (bin_id, bin_offset) of where its tokens land. The standard pre-training
  * batch-construction step (docs are packed, not padded), made deterministic
  * by ordering on the content hash of doc_id (same layout on any engine,
  * cluster size, or day — the [[Sampling]] reproducibility contract).
  *
  * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: a global
  * `sum() OVER (ORDER BY ...)` has a single ordered reducer at 100 TB. Here
  * docs are range-bucketed by the top bits of the hash (bucket order ==
  * hash order, so per-bucket cumsum + bucket prefix == the global cumsum,
  * exactly); the per-bucket totals are `Buckets` numbers — a driver-side
  * prefix sum of a tiny vector — and everything else is per-bucket parallel.
  * The oracle keeps the equivalent single-window formulation.
  */
object Packing {

  val SeqLen = 2048
  val Buckets = 16

  def packing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", size(tokens($"text")).as("n_tokens"))
      .withColumn("h", hash60($"doc_id".cast("string")))
      // hash60 is uniform in [0, 2^60): the top 4 bits give ordered ranges
      // (integer shift — a double division could round a boundary value
      // into a nonexistent 17th bucket)
      .withColumn("bucket", shiftright($"h", 56).cast("int"))
    // tiny per-bucket totals -> driver-side prefix sum (the classic scan)
    val totals = docs.groupBy($"bucket").agg(sum($"n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix: Map[Int, Long] = {
      var acc = 0L
      (0 until Buckets).map { b =>
        val p = b -> acc; acc += totals.getOrElse(b, 0L); p
      }.toMap
    }
    val prefixCol = element_at(
      typedLit((0 until Buckets).map(b => prefix(b))), $"bucket" + 1)
    val local = Window.partitionBy($"bucket").orderBy($"h".asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", prefixCol + coalesce(sum($"n_tokens").over(local), lit(0L)))
      .select($"doc_id", $"n_tokens",
        ($"start" / SeqLen).cast("long").as("bin_id"),
        ($"start" % SeqLen).as("bin_offset"))
      .orderBy($"doc_id")
  }
}

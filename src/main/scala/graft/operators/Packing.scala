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
  * exactly); the per-bucket totals are one number per bucket — a driver-side
  * prefix sum of a small vector — and everything else is per-bucket
  * parallel. The bucket count scales with the session's parallelism (the
  * RESULT is invariant to it: any power-of-two bucketing of the top bits
  * yields the identical global cumsum), so each ordered window partition is
  * ~1/parallelism of the data, not a fixed fraction. The oracle keeps the
  * equivalent single-window formulation.
  */
object Packing {

  val SeqLen = 2048

  /** Smallest power of two ≥ max(16, parallelism), capped so the driver-side
    * prefix vector (one long per bucket) stays trivially small. */
  private def bucketCount(spark: SparkSession): Int = {
    val target = math.min(4096, math.max(16, spark.sparkContext.defaultParallelism))
    var b = 1
    while (b < target) b <<= 1
    b
  }

  def packing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = bucketCount(spark)
    // hash60 is uniform in [0, 2^60): the top log2(buckets) bits give
    // ordered ranges (integer shift — a double division could round a
    // boundary value into a nonexistent extra bucket). Deriving the shift
    // from the bucket count keeps the two from drifting apart.
    val shift = 60 - Integer.numberOfTrailingZeros(buckets)
    // consumed twice (totals job + layout job): cache the 4-col projection
    val docs = graft.sources.Caches.shared(Tables.documents(spark, dir)
      .select($"doc_id", size(tokens($"text")).as("n_tokens"))
      .withColumn("h", hash60($"doc_id".cast("string")))
      .withColumn("bucket", shiftright($"h", shift).cast("int")))
    // tiny per-bucket totals -> driver-side prefix sum (the classic scan)
    val totals = docs.groupBy($"bucket").agg(sum($"n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix: IndexedSeq[Long] = {
      var acc = 0L
      (0 until buckets).map { b => val p = acc; acc += totals.getOrElse(b, 0L); p }
    }
    val prefixCol = element_at(typedLit(prefix), $"bucket" + 1)
    val local = Window.partitionBy($"bucket").orderBy($"h".asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", prefixCol + coalesce(sum($"n_tokens").over(local), lit(0L)))
      // integer division on purpose: a double quotient is exact here only
      // while SeqLen stays a power of two
      .select($"doc_id", $"n_tokens",
        expr(s"start div $SeqLen").as("bin_id"),
        ($"start" % SeqLen).as("bin_offset"))
      .orderBy($"doc_id")
  }

  case class PackDoc(doc_id: Long, n_tokens: Long, shard: Int)
  case class PackState(offset: Long)
  case class PackOut(doc_id: Long, n_tokens: Long, shard: Int,
                     bin_id: Long, bin_offset: Long)

  /** Streaming sequence packing at ingest: each arriving doc is appended
    * head-to-tail to its shard's running token stream and immediately gets
    * its (bin_id, bin_offset) — `flatMapGroupsWithState` keyed by shard,
    * state = ONE long (the shard's token offset), NoTimeout because the
    * state is bounded by the shard count, not the corpus (it must outlive
    * any watermark: the pack position is a running total forever).
    *
    * Semantics vs [[packing]], honestly: the batch operator is the
    * deterministic hash-ordered GLOBAL re-pack (reproducible epochs); the
    * stream packs in ARRIVAL order within each shard (bin_id is
    * shard-local — (shard, bin_id) is the global bin key), because a global
    * arrival order across an unbounded stream is neither available nor
    * deterministic under replay. Both layouts are gap-free and chain
    * per-shard starts contiguously (`StatefulSpec` pins contiguity across
    * micro-batches and per-shard token-total agreement with the batch
    * twin). Within a micro-batch docs sort by doc_id so a replayed batch
    * packs identically. Scale: one shuffle on shard, O(shards) state. */
  def packStream(docs: org.apache.spark.sql.Dataset[PackDoc])
      : org.apache.spark.sql.Dataset[PackOut] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[PackDoc],
         state: org.apache.spark.sql.streaming.GroupState[PackState]) =>
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val placed = rows.toSeq.sortBy(_.doc_id).map { d =>
            val start = off
            off += d.n_tokens
            PackOut(d.doc_id, d.n_tokens, shard, start / SeqLen, start % SeqLen)
          }
          state.update(PackState(off))
          placed.iterator
      }
  }

  val ChunkSize = 64
  val ChunkStride = 48

  /** Context-window chunking: each document's token sequence is cut into
    * fixed-size windows of [[ChunkSize]] tokens advancing by [[ChunkStride]]
    * (16-token overlap) — the standard long-document → model-context
    * preparation step. Pure per-row generator fanout (explode over a
    * sequence of chunk starts): no shuffle, no state, trivially parallel at
    * any corpus size; the final orderBy is presentation only. Chunk count
    * for n tokens is ⌊(n−1)/stride⌋+1, so every token lands in ≥ 1 chunk
    * and the last chunk may be short. */
  def chunking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkRows(Tables.documents(spark, dir)).orderBy($"doc_id", $"chunk_id")
  }

  /** The chunking generator over any (doc_id, text) relation — stateless
    * per-row fanout, so it applies identically to the batch corpus and to
    * an arriving micro-batch (ingest-time context preparation);
    * `StreamProjectionSpec` pins batch/stream agreement. */
  def chunkRows(rows: DataFrame): DataFrame =
    rows
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), floor((col("n") - 1) / ChunkStride).cast("int"))).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * ChunkStride)
      .select(col("doc_id"), col("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(ChunkSize), col("n") - col("chunk_start")).cast("long").as("n_chunk_tokens"),
        element_at(col("toks"), col("chunk_start") + 1).as("first_token"),
        element_at(col("toks"),
          col("chunk_start") + least(lit(ChunkSize), col("n") - col("chunk_start"))).as("last_token"))
}

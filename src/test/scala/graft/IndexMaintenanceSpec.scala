package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Similarity
import graft.sources.{Caches, Tables}

/** Incremental IVF-PQ index maintenance: arriving vectors are assigned and
  * encoded against the PINNED quantizers and appended to the inverted
  * lists (grow-only; coarse/fine quantizers move only on an explicit
  * retrain). The contract has three legs:
  *  - stream-append parity: rows in the delta store are bit-identical to a
  *    one-shot batch encode of the same vectors, regardless of batching;
  *  - replay safety: a re-delivered epoch appends byte-identical rows and
  *    the read-side vec_id dedup makes them invisible;
  *  - serving parity: querying base ∪ delta through the cell-bounded scan
  *    equals serving a store that held all delta rows at once, and an
  *    exact-duplicate probe of an appended vector finds it at cosine 1. */
class IndexMaintenanceSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  // delta arrivals: real fixture embeddings under fresh ids (offset far
  // past the base id space), so cells/codes are nontrivial and a probe's
  // exact twin exists in the base corpus
  private def deltaRows(n: Int): Seq[(Long, Seq[Float])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].head(n).toSeq
      .map { case (id, e) => (id + 1000000L, e) }
  }

  test("streamed appends equal a one-shot batch encode and replay is invisible") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    Caches.releaseAll()
    val store = java.nio.file.Files
      .createTempDirectory("graft-index-delta").toString + "/lists"
    val rows = deltaRows(30)

    val in = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.appendIndexStream(
        in.toDF().toDF("vec_id", "embedding"), spark, dir, store)
      .start()
    // three unordered micro-batches
    in.addData(rows.slice(10, 20): _*); q.processAllAvailable()
    in.addData(rows.slice(0, 10): _*);  q.processAllAvailable()
    in.addData(rows.slice(20, 30): _*); q.processAllAvailable()
    q.stop()

    val streamed = Similarity.readIndexDelta(spark, store)
      .orderBy($"vec_id").collect().map(_.toSeq).toSeq
    val batch = Similarity.encodeForIndex(spark, dir,
        rows.toDF("vec_id", "embedding"))
      .orderBy($"vec_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch, "delta store differs from one-shot batch encode")
    assert(streamed.size == 30)

    // replay: re-deliver one epoch's rows; the appended duplicates are
    // byte-identical and vanish behind the read-side dedup
    Similarity.encodeForIndex(spark, dir,
        rows.slice(10, 20).toDF("vec_id", "embedding"))
      .write.mode("append").parquet(store)
    val replayed = Similarity.readIndexDelta(spark, store)
      .orderBy($"vec_id").collect().map(_.toSeq).toSeq
    assert(replayed == batch, "epoch replay leaked through the vec_id dedup")

    // serving parity + recall of the appended rows: probe with a base
    // vector whose exact duplicate was appended — the delta twin must
    // surface at cosine 1 through the cell-bounded scan
    val probes = {
      val c = Similarity.corpus(spark, dir)
      c.filter($"vec_id" === 0L)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    }
    val served = Similarity.topkIvfPqWithDelta(spark, dir, probes,
      rows.toDF("vec_id", "embedding"), store)
    val top = served.orderBy($"rank").collect()
    assert(top.nonEmpty, "delta-serving returned nothing")
    assert(top.exists(r => r.getLong(r.fieldIndex("neighbor_id")) == 1000000L &&
        math.abs(r.getDouble(r.fieldIndex("cosine")) - 1.0) < 1e-9),
      s"appended exact twin of the probe not in top-k: ${top.map(_.toSeq).mkString(", ")}")
    Caches.releaseAll()
  }
}

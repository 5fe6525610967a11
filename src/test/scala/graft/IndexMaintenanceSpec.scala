package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Similarity, TextAnalysis}
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

  test("lexical segments: streamed postings equal batch encode, pinned-idf serving retrieves appends") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    Caches.releaseAll()
    val store = java.nio.file.Files
      .createTempDirectory("graft-postings-delta").toString + "/seg"
    // re-uploaded fixture docs under fresh ids — tokenization nontrivial,
    // and a base query's rarest terms exist verbatim in its appended twin
    val rows: Seq[(Long, String)] = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].head(20).toSeq
      .map { case (id, t) => (id + 1000000L, t) }

    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.appendPostingsStream(
        in.toDF().toDF("doc_id", "text"), spark, dir, store)
      .start()
    in.addData(rows.slice(8, 20): _*); q.processAllAvailable()
    in.addData(rows.slice(0, 8): _*);  q.processAllAvailable()
    q.stop()

    val streamed = TextAnalysis.readPostingsDelta(spark, store)
      .orderBy($"doc_id", $"tok").collect().map(_.toSeq).toSeq
    val batch = TextAnalysis.encodeForPostings(rows.toDF("doc_id", "text"))
      .orderBy($"doc_id", $"tok").collect().map(_.toSeq).toSeq
    assert(streamed == batch, "postings segment differs from batch encode")

    // replay an epoch: byte-identical rows vanish behind the dedup
    TextAnalysis.encodeForPostings(rows.slice(8, 20).toDF("doc_id", "text"))
      .write.mode("append").parquet(store)
    assert(TextAnalysis.readPostingsDelta(spark, store)
        .orderBy($"doc_id", $"tok").collect().map(_.toSeq).toSeq == batch,
      "epoch replay leaked through the (doc_id, tok) dedup")

    // pinned-idf serving: query with doc 0's tokens — its appended twin
    // carries the same tf/dl for every query term, so it must tie the base
    // doc's score and surface in the top-k
    val probeToks = Tables.documents(spark, dir)
      .filter($"doc_id" === 0L)
      .select(org.apache.spark.sql.functions.lit(0L).as("query_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array_distinct(
            graft.functions.Text.tokens($"text"))).as("tok"))
    val served = TextAnalysis.bm25TopKWithDelta(spark, dir, probeToks, store)
      .collect()
    assert(served.nonEmpty)
    assert(served.exists(_.getLong(1) == 1000000L),
      s"appended twin of the probe doc not retrieved: ${served.map(_.toSeq).mkString(", ")}")
    Caches.releaseAll()
  }

  test("fused serving retrieves an appended document through BOTH delta legs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, col, explode, lit}
    Caches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-hybrid-delta").toString
    // the re-uploaded entity: doc 0's text under id+10^6 in the lexical
    // segment, vec 0's embedding under the same fresh id in the dense lists
    val docTwin = Tables.documents(spark, dir).filter($"doc_id" === 0L)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    TextAnalysis.encodeForPostings(docTwin)
      .write.mode("append").parquet(s"$tmp/seg")
    val vecTwin = Tables.embeddings(spark, dir).filter($"vec_id" === 0L)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    Similarity.encodeForIndex(spark, dir, vecTwin)
      .write.mode("append").parquet(s"$tmp/lists")

    // probe = the base entity itself (text + embedding)
    val probe = Tables.documents(spark, dir).filter($"doc_id" === 0L)
      .select(lit(0L).as("query_id"), $"text")
      .crossJoin(Tables.embeddings(spark, dir).filter($"vec_id" === 0L)
        .select($"embedding"))
    val fused = Similarity.hybridRrfWithDelta(spark, dir, probe,
      s"$tmp/seg", vecTwin, s"$tmp/lists").collect()
    val twin = fused.find(_.getLong(fused.head.fieldIndex("doc_id")) == 1000000L)
    assert(twin.isDefined,
      s"appended entity missing from the fused list: ${fused.map(_.toSeq).mkString(", ")}")
    assert(twin.get.getInt(twin.get.fieldIndex("lex_rank")) > 0 &&
        twin.get.getInt(twin.get.fieldIndex("sem_rank")) > 0,
      s"appended entity not retrieved by BOTH legs: ${twin.get.toSeq}")
    Caches.releaseAll()
  }

  test("a persisted index serves bit-identically to the in-session build") {
    import spark.implicits._
    Caches.releaseAll()
    val idx = java.nio.file.Files
      .createTempDirectory("graft-index-save").toString
    Similarity.saveIndex(spark, dir, idx)
    def probes = {
      val c = Similarity.corpus(spark, dir)
      c.filter($"vec_id" % 500 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    }
    val inSession = Similarity.topkIvfPqFor(spark, dir, probes)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    // a fresh serving session holds none of the build's memos
    Caches.releaseAll()
    val fromSaved = Similarity.topkIvfPqFromSaved(spark, dir, probes, idx)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(fromSaved == inSession,
      "persisted-index serving differs from the in-session build")
    assert(fromSaved.nonEmpty)
    Caches.releaseAll()
  }
}

package graft

import graft.operators.{Multimodal, Similarity, TextAnalysis}
import graft.sources.{Caches, Tables}

/** The session-scoped serving-leg memos (`Caches.memoized` + `shared`) must
  * be pure caching: every memoized handle must return exactly the rows a
  * fresh, memo-bypassing build of the same plan produces. A stale or
  * wrongly-keyed memo would pass the per-query oracles (each query reads
  * the same memo consistently) but silently decouple the serving leg from
  * its definition — this suite pins the equivalence directly. */
class MemoParitySpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def assertSameRows(name: String,
      memoized: org.apache.spark.sql.DataFrame,
      fresh: org.apache.spark.sql.DataFrame): Unit = {
    assert(memoized.schema == fresh.schema, s"$name: schema drift")
    val cols = memoized.columns.map(org.apache.spark.sql.functions.col).toSeq
    val m = memoized.sort(cols: _*).collect().toSeq
    val f = fresh.sort(cols: _*).collect().toSeq
    assert(m == f, s"$name: memoized rows differ from a fresh build")
  }

  test("memoized handles are stable within a session and parity-exact") {
    Caches.releaseAll()
    // same handle back on a second call (the memo contract)
    val t1 = Similarity.topkBruteForce(spark, dir)
    assert(t1 eq Similarity.topkBruteForce(spark, dir))

    // brute-force truth: memo vs a direct workload-scan build
    assertSameRows("topkBruteForce", t1, {
      import spark.implicits._
      val c = Similarity.corpus(spark, dir)
      Similarity.topkBruteForceFor(c, Similarity.strideQueries(c))
        .orderBy($"query_id", $"rank")
    })

    // seeded-PQ ranked list: memo vs rebuild of the same three stages
    assertSameRows("topkPq", Similarity.topkPq(spark, dir), {
      val c = Similarity.corpus(spark, dir)
      Similarity.pqRerank(c, Similarity.strideQueries(c),
        Similarity.pqAdcScan(spark, dir))
    })

    // refined-PQ ranked list: memo vs a rebuild of the training chain
    // (fixed oracle Lloyd rounds) + ADC scan + rerank
    assertSameRows("refinedTopk", Similarity.refinedTopk(spark, dir), {
      val c = Similarity.corpus(spark, dir)
      val q = Similarity.strideQueries(c)
      val (cb1, _) = Similarity.pqRefineCodebook(c,
        Similarity.stridePqCodebook(spark, dir),
        Similarity.PqRefineOracleIters, earlyStop = false)
      Similarity.pqRerank(c, q, Similarity.pqAdcScanFor(c, q, cb1))
    })

    // BM25 stride workload: memo vs the un-memoized impl
    assertSameRows("bm25TopK", TextAnalysis.bm25TopK(spark, dir),
      TextAnalysis.bm25TopKImpl(spark, dir, None))

    // corpus chunk/frame tables: memo vs a fresh boundary scan
    assertSameRows("cdcCorpusChunks", Multimodal.cdcCorpusChunks(spark, dir),
      Multimodal.cdcChunks(Tables.spread(Tables.documents(spark, dir))))
    assertSameRows("corpusFrameHashes", Multimodal.corpusFrameHashes(spark, dir),
      Multimodal.frameHashes(Tables.spread(Tables.documents(spark, dir))))

    // releaseAll drops the memo: a new handle is built afterwards
    Caches.releaseAll()
    assert(!(t1 eq Similarity.topkBruteForce(spark, dir)))
    Caches.releaseAll()
  }
}

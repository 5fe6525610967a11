package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.CorpusLake
import graft.sources.{Caches, Formats, Tables}

/** Zone-map data skipping over the corpus lake's docs store:
  * [[CorpusLake.collectFileStats]] + [[CorpusLake.readCorpusAtRange]].
  * The contract under test is twofold — the pruned read is row-identical
  * to the full read filtered to the range (under updates, tombstones,
  * version pins, and STALE stats), and on a range-packed store it
  * actually opens fewer files. */
class LakeSkippingSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def commitTo(corpus: String, v: Long): Unit = {
    import spark.implicits._
    Seq((v, 0L, 0L, 0L, 0L, 0L))
      .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
        "n_contaminated", "n_low_quality")
      .write.mode("append").parquet(s"$corpus/manifest")
  }

  /** A lake with three committed epochs over the fixture documents:
    * epoch 0 LWW-updates ids ≡1 (mod 10), epoch 1 is a real deleteDocs of
    * ids ≡2 (mod 9), epoch 2 updates ids ≡3 (mod 5) — so a range read
    * crosses updates, tombstones, shadowed base rows, and a
    * tombstone-overriding re-upload. */
  private def buildLake(): String = {
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft-skip-lake").toString + "/corpus"
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    docs.filter($"doc_id" % 10 === 1)
      .select($"doc_id", concat($"text", lit(" u1")).as("text"),
        lit(0L).as("epoch"))
      .write.mode("append").parquet(s"$corpus/docs")
    commitTo(corpus, 0L)
    val vDel = CorpusLake.deleteDocs(spark, corpus,
      docs.filter($"doc_id" % 9 === 2).select($"doc_id"))
    assert(vDel == 1L, s"delete committed at $vDel")
    docs.filter($"doc_id" % 5 === 3)
      .select($"doc_id", concat($"text", lit(" u2")).as("text"),
        lit(2L).as("epoch"))
      .write.mode("append").parquet(s"$corpus/docs")
    commitTo(corpus, 2L)
    corpus
  }

  private def served(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] = {
    import spark.implicits._
    df.select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sorted
  }

  test("data skipping: pruned range read is row-identical and opens fewer files") {
    val corpus = buildLake()
    // pack into many small range-laid files so zones are tight, then profile
    CorpusLake.optimizeCorpusVersioned(spark, corpus, targetRowsPerFile = 32L)
    val profiled = CorpusLake.collectFileStats(spark, corpus)
    assert(profiled > 3, s"expected a multi-file packed store, got $profiled")

    // point lookup: zones must exclude most files
    val (candPoint, total) = CorpusLake.pruningStats(spark, corpus, 42L, 42L)
    assert(total == profiled, s"live files $total != profiled $profiled")
    assert(candPoint < total,
      s"point lookup pruned nothing: $candPoint of $total files")

    // row-identity vs the full read, across a range holding every semantic
    val full = served(CorpusLake.readCorpusAt(spark, dir, corpus)
      .filter(col("doc_id").between(100L, 299L)))
    val pruned = served(
      CorpusLake.readCorpusAtRange(spark, dir, corpus, 100L, 299L))
    assert(pruned == full, "pruned read diverged from the full read")
    assert(full.nonEmpty, "empty fixture range — test is vacuous")

    // an out-of-corpus range opens (almost) nothing and serves nothing
    val (candMiss, _) = CorpusLake.pruningStats(spark, corpus, 900000L, 900100L)
    assert(candMiss == 0, s"miss range still opened $candMiss files")
    assert(served(CorpusLake.readCorpusAtRange(
      spark, dir, corpus, 900000L, 900100L)).isEmpty)
  }

  test("data skipping: version pin prunes future-epoch files and stays identical") {
    val corpus = buildLake()
    CorpusLake.optimizeCorpusVersioned(spark, corpus, targetRowsPerFile = 32L)
    CorpusLake.collectFileStats(spark, corpus)
    // pinned at v0 only epoch-0 zones can matter: strictly fewer candidates
    // than the head read of the same range sees
    val (candV0, _) = CorpusLake.pruningStats(spark, corpus, 0L, 499L, Some(0L))
    val (candHead, _) = CorpusLake.pruningStats(spark, corpus, 0L, 499L)
    assert(candV0 < candHead,
      s"version pin pruned nothing: $candV0 vs head $candHead")
    for (v <- Seq(0L, 1L, 2L)) {
      val full = served(CorpusLake.readCorpusAt(spark, dir, corpus, Some(v))
        .filter(col("doc_id").between(100L, 299L)))
      val pruned = served(CorpusLake.readCorpusAtRange(
        spark, dir, corpus, 100L, 299L, Some(v)))
      assert(pruned == full, s"pruned read diverged at pinned version $v")
    }
  }

  test("data skipping: stale stats degrade to conservative reads, never to wrong ones") {
    import spark.implicits._
    val corpus = buildLake()
    CorpusLake.collectFileStats(spark, corpus)

    // post-collect append: the new epoch's file has no zone row, so the
    // pruned read must still serve its rows
    val v3 = 3L
    Seq((101L, "fresh text after stats", v3))
      .toDF("doc_id", "text", "epoch")
      .write.mode("append").parquet(s"$corpus/docs")
    Seq((v3, 0L, 0L, 0L, 0L, 0L))
      .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
        "n_contaminated", "n_low_quality")
      .write.mode("append").parquet(s"$corpus/manifest")
    val afterAppend = served(
      CorpusLake.readCorpusAtRange(spark, dir, corpus, 101L, 101L))
    assert(afterAppend == Seq((101L, "fresh text after stats")),
      s"stale-stats read missed the post-collect append: $afterAppend")

    // generation flip: every profiled path is superseded, so pruning
    // falls back to the full listing — and the read stays identical
    CorpusLake.optimizeCorpusVersioned(spark, corpus, targetRowsPerFile = 32L)
    val (cand, total) = CorpusLake.pruningStats(spark, corpus, 42L, 42L)
    assert(cand == total,
      s"stale zones still pruned a flipped store: $cand of $total")
    val full = served(CorpusLake.readCorpusAt(spark, dir, corpus)
      .filter(col("doc_id").between(100L, 299L)))
    val pruned = served(
      CorpusLake.readCorpusAtRange(spark, dir, corpus, 100L, 299L))
    assert(pruned == full, "post-flip pruned read diverged")

    // re-collect against the new generation restores real pruning
    CorpusLake.collectFileStats(spark, corpus)
    val (cand2, total2) = CorpusLake.pruningStats(spark, corpus, 42L, 42L)
    assert(cand2 < total2,
      s"re-collected stats pruned nothing: $cand2 of $total2")
  }

  test("data skipping: scattered-id lookup is row-identical and prunes") {
    val corpus = buildLake()
    CorpusLake.optimizeCorpusVersioned(spark, corpus, targetRowsPerFile = 32L)
    CorpusLake.collectFileStats(spark, corpus)
    // scattered points + a contiguous run, crossing updates/deletes
    val ids = Seq(3L, 4L, 5L, 42L, 101L, 260L, 433L, 900000L)
    val full = served(CorpusLake.readCorpusAt(spark, dir, corpus)
      .filter(col("doc_id").isin(ids: _*)))
    val got = served(CorpusLake.readCorpusForIds(spark, dir, corpus, ids))
    assert(got == full, "id-set lookup diverged from the full read")
    assert(full.nonEmpty, "vacuous id set")
    // and at a pinned version
    val fullV0 = served(CorpusLake.readCorpusAt(spark, dir, corpus, Some(0L))
      .filter(col("doc_id").isin(ids: _*)))
    assert(served(CorpusLake.readCorpusForIds(spark, dir, corpus, ids,
      Some(0L))) == fullV0, "pinned id-set lookup diverged")
    intercept[IllegalArgumentException] {
      CorpusLake.readCorpusForIds(spark, dir, corpus, Nil)
    }
  }

  test("data skipping: incremental collect scans only the file delta") {
    import spark.implicits._
    val corpus = buildLake()
    val (n1, t1) = CorpusLake.collectFileStatsIncremental(spark, corpus)
    assert(n1 == t1 && n1 > 0, s"first collect must profile all: $n1 of $t1")
    // idempotent no-op when nothing changed
    assert(CorpusLake.collectFileStatsIncremental(spark, corpus)._1 == 0L)
    // append an epoch: only its files are fresh, and the new zone serves
    Seq((7L, "incr text", 3L)).toDF("doc_id", "text", "epoch")
      .write.mode("append").parquet(s"$corpus/docs")
    commitTo(corpus, 3L)
    val (n3, t3) = CorpusLake.collectFileStatsIncremental(spark, corpus)
    assert(n3 == t3 - t1 && n3 >= 1,
      s"delta collect scanned $n3, expected exactly the ${t3 - t1} new files")
    val (cand, total) = CorpusLake.pruningStats(spark, corpus, 7L, 7L)
    assert(cand < total, s"point read pruned nothing: $cand of $total")
    assert(served(CorpusLake.readCorpusAtRange(spark, dir, corpus, 7L, 7L))
      == Seq((7L, "incr text")))
  }

  test("data skipping: the maintenance stream keeps zones fresh at the optimize cadence") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    Caches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-skip-stream").toString
    val (idx, corpus, maint) = (s"$tmp/idx", s"$tmp/corpus", s"$tmp/maint")
    CorpusLake.initCorpus(spark, dir, idx)
    val tA = (1 to 40).map(i => s"skipa$i").mkString(" ")
    val tB = (1 to 40).map(i => s"skipb$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = CorpusLake.maintainCorpusStream(
        in.toDF().toDF("doc_id", "text"), spark, dir, idx, corpus, maint,
        optimizeEvery = 1)
      .start()
    try {
      in.addData((9000001L, tA)); q.processAllAvailable()
      in.addData((9000002L, tB)); q.processAllAvailable()
    } finally q.stop()
    // every optimize firing refreshed the zones inline: the artifact is
    // live and covers the whole packed store with no standalone collect
    assert(Formats.pathExists(spark, s"$corpus/file_stats"),
      "stream did not materialize zone maps at its optimize cadence")
    assert(CorpusLake.collectFileStatsIncremental(spark, corpus)._1 == 0L,
      "stream left unprofiled live files behind")
    assert(served(CorpusLake.readCorpusAtRange(
      spark, dir, corpus, 9000001L, 9000002L))
      == Seq((9000001L, tA), (9000002L, tB)))
  }
}

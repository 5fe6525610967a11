package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{explode, typedLit}
import graft.functions.Text.tokens
import graft.operators.{CorpusLake, Curate, Dedup, Similarity, TextAnalysis}
import graft.sources.{Caches, Tables}

/** The composed platform loop, end to end on ONE lake: admission-gated
  * ingest commits epochs; the SAME commit feed refreshes the lexical and
  * dense indexes and the materialized profile; a fresh serving session
  * (all memos dropped) answers fused hybrid retrieval, crawl dedup, and
  * profile reads from cold artifacts; a pinned run survives a vacuum.
  * Every piece is spec'd in isolation elsewhere — this pins that they
  * compose on shared state. */
class PlatformSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("one commit feed drives admission, all three indexes, the view, and retention") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    Caches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-platform").toString
    val (dedupIdx, corpus, maint, denseIdx, lexIdx, prof) =
      (s"$tmp/dedup", s"$tmp/corpus", s"$tmp/maint", s"$tmp/dense",
        s"$tmp/lex", s"$tmp/prof")
    CorpusLake.initCorpus(spark, dir, dedupIdx)
    TextAnalysis.savePostingsIndex(spark, dir, lexIdx)
    Similarity.saveIndex(spark, dir, denseIdx)
    CorpusLake.initProfile(spark, dir, prof)

    val pool = Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("tok")).distinct()
      .orderBy($"tok").as[String].collect()
    def cycled(stride: Int): String =
      (0 until 40).map(i => pool((i * stride) % pool.length)).mkString(" ")
    val docA = cycled(1)
    val docB = cycled(5)
    // a near-dup of docA (last token changed -> jaccard ~0.85)
    val docADup = (docA.split(" ").dropRight(1) :+ "changed").mkString(" ")

    // ingest: two committed epochs; the near-dup must be REJECTED and
    // therefore never reach any index or the view. The health-metrics
    // listener rides the same session — the ops surface observes the
    // REAL maintenance loop, not a synthetic probe query.
    val metricsDir = s"$tmp/metrics"
    val listener = graft.streaming.StreamMetrics.attach(spark, metricsDir)
    val in = MemoryStream[(Long, String)]
    val q = CorpusLake.maintainCorpusStream(
        in.toDF().toDF("doc_id", "text"), spark, dir, dedupIdx, corpus,
        maint, profDir = Some(prof))
      .start()
    in.addData((7000001L, docA)); q.processAllAvailable()
    in.addData((7000002L, docB), (7000003L, docADup))
    q.processAllAvailable()
    q.stop()
    // metrics: the listener bus is async — poll for the ingest batches,
    // then pin that BOTH maintenance micro-batches were recorded with
    // real volume and duration. (input_rows for a multi-action
    // foreachBatch body sums the source reads across its actions — a
    // volume indicator, not the arrival count; MetricsSpec pins the
    // exact-count case on a single-action sink.)
    val mDeadline = System.currentTimeMillis() + 30000
    def mRows() = graft.streaming.StreamMetrics.metrics(spark, metricsDir)
      .filter($"input_rows" > 0)
    while (mRows().count() < 2 && System.currentTimeMillis() < mDeadline)
      Thread.sleep(200)
    graft.streaming.StreamMetrics.detach(spark, listener)
    val recorded = mRows()
      .select($"batch_id", $"input_rows", $"batch_duration_ms")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(recorded.map(_._1) == Seq(0L, 1L) &&
      recorded.forall(r => r._2 > 0 && r._3 > 0),
      s"stream metrics did not record the maintenance batches: $recorded")
    val log = CorpusLake.admissionLog(spark, corpus)
      .select($"doc_id", $"decision").as[(Long, String)].collect().toMap
    assert(log == Map(7000001L -> Curate.Admitted,
      7000002L -> Curate.Admitted, 7000003L -> Curate.Duplicate),
      s"admission log: $log")
    val head = CorpusLake.manifest(spark, corpus)
      .agg(org.apache.spark.sql.functions.max($"version")).as[Long].head()

    // the SAME commits refresh both retrieval indexes; the rejected doc is
    // absent from the change feed by construction
    val emb0 = Tables.embeddings(spark, dir)
      .filter($"vec_id" === 0L).select($"embedding").as[Seq[Float]].head()
    val emb1 = Tables.embeddings(spark, dir)
      .filter($"vec_id" === 1L).select($"embedding").as[Seq[Float]].head()
    def embed(changes: org.apache.spark.sql.DataFrame) =
      changes.select($"doc_id".as("vec_id"),
        org.apache.spark.sql.functions
          .when($"doc_id" === 7000001L, typedLit(emb0))
          .otherwise(typedLit(emb1)).as("embedding"),
        $"version")
    // freshness DESCRIBE: before any refresh both retrieval legs trail by
    // the full commit count (never-refreshed = cursor −1); the profile
    // refreshed inline with the stream, so it is already at the head
    val lag0 = CorpusLake.refreshLag(spark, corpus, Some(maint), Some(prof))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(lag0("postings") == ((-1L, 2L)) && lag0("dense") == ((-1L, 2L)) &&
      lag0("profile") == ((head, 0L)), s"pre-refresh lag: $lag0")
    assert(CorpusLake.refreshPostingsFromLake(spark, dir, corpus, maint)
      .contains((Long.MinValue, head)))
    assert(CorpusLake.refreshIndexFromLake(spark, dir, corpus, maint, embed)
      .contains((Long.MinValue, head)))
    // after the refreshes every consumer is at the head: lag 0 everywhere
    val lag1 = CorpusLake.refreshLag(spark, corpus, Some(maint), Some(prof))
      .select($"consumer", $"cursor_version", $"lag_commits")
      .as[(String, Long, Long)].collect()
    assert(lag1.forall(r => r._2 == head && r._3 == 0L),
      s"post-refresh lag not zero: ${lag1.toSeq}")

    // ---- a FRESH serving session: cold artifacts only
    Caches.releaseAll()

    // fused hybrid retrieval over both lake-refreshed delta legs: probing
    // with docA's text + its embedding twin must surface the admitted doc
    val deltaVecs = Seq((7000001L, emb0), (7000002L, emb1))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, docA)).toDF("query_id", "text")
      .select($"query_id", $"text", typedLit(emb0).as("embedding"))
    val fused = Similarity.hybridRrfFromSaved(spark, dir, queries,
        denseIdx, lexIdx, Some(s"$maint/seg"), Some(s"$maint/lists"),
        Some(deltaVecs))
      .select($"doc_id").as[Long].collect().toSet
    assert(fused.contains(7000001L),
      s"lake-admitted doc not retrievable through the cold fused path: $fused")
    // the rejected near-dup is nowhere
    assert(!fused.contains(7000003L))

    // crawl dedup from cold artifacts ∪ the lake's bucket store: a
    // byte-copy of the admitted doc is flagged against IT, not just base
    val flagged = Dedup.dedupArrivalsFromSaved(spark, dir,
        Seq((9000001L, docA)).toDF("doc_id", "text"), dedupIdx,
        Some(s"$maint/buckets"),
        Some(CorpusLake.readCorpusAt(spark, dir, corpus, None)))
      .select($"arriving_id", $"existing_id").as[(Long, Long)]
      .collect().toSet
    assert(flagged.contains((9000001L, 7000001L)),
      s"crawl copy of an admitted doc not flagged: $flagged")

    // the loop-maintained profile serves cold and matches a recompute
    val served = CorpusLake.profile(spark, prof)
      .orderBy($"band").collect().map(_.toSeq).toSeq
    val recomputed = CorpusLake.profileOf(
        CorpusLake.readCorpusAt(spark, dir, corpus, None))
      .orderBy($"band").collect().map(_.toSeq).toSeq
    assert(served == recomputed, "cold profile view differs from recompute")

    // the lake-refreshed delta stores are the SAME format the index
    // compactors fold: compact both legs into the persisted bases and the
    // cold fused serving stays bit-identical with EMPTY stores
    val fusedRows = Similarity.hybridRrfFromSaved(spark, dir, queries,
        denseIdx, lexIdx, Some(s"$maint/seg"), Some(s"$maint/lists"),
        Some(deltaVecs))
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    TextAnalysis.compactPostings(spark, lexIdx, s"$maint/seg")
    Similarity.compactIndex(spark, denseIdx, s"$maint/lists")
    assert(spark.read.parquet(s"$maint/seg").count() == 0 &&
      spark.read.parquet(s"$maint/lists").count() == 0)
    assert(Similarity.hybridRrfFromSaved(spark, dir, queries,
        denseIdx, lexIdx, Some(s"$maint/seg"), Some(s"$maint/lists"),
        Some(deltaVecs))
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
      == fusedRows,
      "fused serving changed after compacting the lake-refreshed stores")

    // governance: pin the release, vacuum at its version, run still serves
    assert(CorpusLake.pinRun(spark, dir, corpus, "release_1") == head)
    CorpusLake.vacuumCorpus(spark, corpus, head)
    assert(CorpusLake.readRunCorpus(spark, dir, corpus, "release_1")
      .filter($"doc_id" >= 7000000L).count() == 2)
    Caches.releaseAll()
  }

  test("retraction composes: ingest, delete, crash-restart — no leg serves the deleted doc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    Caches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-platform-del").toString
    val (dedupIdx, corpus, maint, denseIdx, lexIdx, ckpt) =
      (s"$tmp/dedup", s"$tmp/corpus", s"$tmp/maint", s"$tmp/dense",
        s"$tmp/lex", s"$tmp/ckpt")
    CorpusLake.initCorpus(spark, dir, dedupIdx)
    TextAnalysis.savePostingsIndex(spark, dir, lexIdx)
    Similarity.saveIndex(spark, dir, denseIdx)

    val pool = Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("tok")).distinct()
      .orderBy($"tok").as[String].collect()
    def cycled(stride: Int): String =
      (0 until 40).map(i => pool((i * stride) % pool.length)).mkString(" ")
    val (docA, docC) = (cycled(1), cycled(13))
    def embOf(i: Long) = Tables.embeddings(spark, dir)
      .filter($"vec_id" === i).select($"embedding").as[Seq[Float]].head()
    val (emb0, emb2) = (embOf(0L), embOf(2L))
    def embed(changes: org.apache.spark.sql.DataFrame) =
      changes.select($"doc_id".as("vec_id"),
        org.apache.spark.sql.functions
          .when($"doc_id" === 8000001L, typedLit(emb0))
          .otherwise(typedLit(emb2)).as("embedding"),
        $"version")
    def start(in: MemoryStream[(Long, String)]) =
      CorpusLake.maintainCorpusStream(
          in.toDF().toDF("doc_id", "text"), spark, dir, dedupIdx, corpus,
          maint)
        .option("checkpointLocation", ckpt).start()

    val in = MemoryStream[(Long, String)]
    val q = start(in)
    in.addData((8000001L, docA)); q.processAllAvailable()
    q.stop()
    assert(CorpusLake.refreshPostingsFromLake(spark, dir, corpus, maint)
      .isDefined)
    assert(CorpusLake.refreshIndexFromLake(spark, dir, corpus, maint, embed)
      .isDefined)
    def lexHits(text: String): Set[Long] = TextAnalysis.bm25TopKFromSaved(
        spark, lexIdx,
        Seq((0L, text)).toDF("query_id", "text")
          .select($"query_id",
            explode(org.apache.spark.sql.functions
              .array_distinct(tokens($"text"))).as("tok")),
        Some(s"$maint/seg"))
      .select($"doc_id").as[Long].collect().toSet
    def denseHits(probeVec: Long): Set[Long] = {
      val c = Similarity.corpus(spark, dir)
      val probes = c.filter($"vec_id" === probeVec)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
      Similarity.topkIvfPqFromSavedWithDelta(spark, dir, probes, denseIdx,
          s"$maint/lists",
          Seq((8000001L, emb0), (8000003L, emb2)).toDF("vec_id", "embedding"))
        .select($"neighbor_id").as[Long].collect().toSet
    }
    assert(lexHits(docA).contains(8000001L) &&
      denseHits(0L).contains(8000001L), "pre-delete serving")

    // the takedown, in the stream's quiet window; then CRASH the
    // refresher stack (cursors lost before their post-delete write) and
    // byte-identically replay the tombstone epoch into the store
    val vDel = CorpusLake.deleteDocs(spark, corpus,
      Seq(8000001L).toDF("doc_id"))
    assert(CorpusLake.refreshPostingsFromLake(spark, dir, corpus, maint)
      .isDefined)
    assert(CorpusLake.refreshIndexFromLake(spark, dir, corpus, maint, embed)
      .isDefined)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$maint/lake_cursor"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$maint/dense_lake_cursor"), true)
    Seq((8000001L, null.asInstanceOf[String], vDel, true))
      .toDF("doc_id", "text", "epoch", "_deleted")
      .write.mode("append").parquet(s"$corpus/docs")

    // restart ingest from the SAME checkpoint: batch ids continue, the
    // next commit allocates a version past the delete epoch
    val q2 = start(in)
    in.addData((8000003L, docC)); q2.processAllAvailable()
    q2.stop()
    val head = CorpusLake.manifest(spark, corpus)
      .agg(org.apache.spark.sql.functions.max($"version")).as[Long].head()
    assert(head == vDel + 1,
      s"post-restart commit did not step past the delete epoch: $head")

    // cursor-less refreshers bootstrap from scratch — the suppressed
    // insert+delete plus the already-appended tombstones keep the doc
    // retracted; the new doc flows through
    assert(CorpusLake.refreshPostingsFromLake(spark, dir, corpus, maint)
      .isDefined)
    assert(CorpusLake.refreshIndexFromLake(spark, dir, corpus, maint, embed)
      .isDefined)
    Caches.releaseAll()
    assert(!lexHits(docA).contains(8000001L),
      "deleted doc served through the lexical leg after crash-restart")
    assert(!denseHits(0L).contains(8000001L),
      "deleted doc served through the dense leg after crash-restart")
    assert(lexHits(docC).contains(8000003L),
      "post-restart admission did not reach the lexical leg")
    assert(denseHits(2L).contains(8000003L),
      "post-restart admission did not reach the dense leg")

    // and the admission gate agrees: a byte-copy of the DELETED text is
    // admissible again (the corpus no longer contains it), while a
    // byte-copy of the live doc stays a duplicate
    val q3 = start(in)
    in.addData((8000004L, docA), (8000005L, docC)); q3.processAllAvailable()
    q3.stop()
    val log = CorpusLake.admissionLog(spark, corpus)
      .filter($"doc_id" >= 8000004L)
      .select($"doc_id", $"decision").as[(Long, String)].collect().toMap
    assert(log == Map(8000004L -> Curate.Admitted,
      8000005L -> Curate.Duplicate),
      s"post-delete admission verdicts: $log")
    Caches.releaseAll()
  }

  test("experiment loop composes: branch ablation, merge with index upkeep, replica + view convergence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    Caches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-platform-branch").toString
    val (dedupIdx, parent, pMaint) = (s"$tmp/dedup", s"$tmp/parent", s"$tmp/pm")
    val (branch, bMaint, view, replica) =
      (s"$tmp/exp", s"$tmp/bm", s"$tmp/view", s"$tmp/replica")
    CorpusLake.initCorpus(spark, dir, dedupIdx)
    graft.operators.LakeView.createView(spark, dir, view,
      dims = Seq("bucket" -> "CAST(doc_id % 5 AS INT)"),
      measures = Seq("chars" -> "CAST(length(text) AS BIGINT)"))

    val pool = Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("tok")).distinct()
      .orderBy($"tok").as[String].collect()
    def cycled(stride: Int): String =
      (0 until 40).map(i => pool((i * stride) % pool.length)).mkString(" ")
    val (docA, docB, docC) = (cycled(1), cycled(5), cycled(9))
    def nearDup(t: String) =
      (t.split(" ").dropRight(1) :+ "changed").mkString(" ")
    def served(corpus: String): Seq[(Long, String)] =
      CorpusLake.readCorpusAt(spark, dir, corpus)
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sorted

    // mainline ingest keeps the declared view live at commit cadence
    val inP = MemoryStream[(Long, String)]
    val qP = CorpusLake.maintainCorpusStream(
        inP.toDF().toDF("doc_id", "text"), spark, dir, dedupIdx, parent,
        pMaint, viewDirs = Seq(view))
      .start()
    try {
      inP.addData((7100001L, docA), (7100002L, docB))
      qP.processAllAvailable()
    } finally qP.stop()

    // the experiment branch: admission on the branch knows the SHARED
    // history (near-dup of docA rejected) but admits fresh content
    CorpusLake.createBranch(spark, dir, parent, branch, "abl")
    val inB = MemoryStream[(Long, String)]
    val qB = CorpusLake.maintainCorpusStream(
        inB.toDF().toDF("doc_id", "text"), spark, dir, dedupIdx, branch,
        bMaint, sharedBucketDirs = Seq(s"$pMaint/buckets"))
      .start()
    try {
      inB.addData((7100005L, docC), (7100006L, nearDup(docA)))
      qB.processAllAvailable()
    } finally qB.stop()
    val bLog = CorpusLake.admissionLog(spark, branch)
      .filter($"doc_id" >= 7100005L)
      .select($"doc_id", $"decision").as[(Long, String)].collect().toMap
    assert(bLog == Map(7100005L -> Curate.Admitted,
      7100006L -> Curate.Duplicate), s"branch admission: $bLog")
    assert(!served(parent).exists(_._1 == 7100005L),
      "branch content leaked into the parent before the merge")

    // merge with parent index upkeep; consumers converge
    val vM = CorpusLake.mergeBranch(spark, branch, Some(pMaint))
    assert(served(parent).exists(r => r._1 == 7100005L && r._2 == docC),
      "merged doc missing from the parent head")
    graft.operators.LakeView.refreshViewFromLake(spark, dir, parent, view)
    val viewGot = graft.operators.LakeView.readView(spark, view)
      .orderBy($"bucket").collect().map(_.toSeq).toSeq
    val viewWant = CorpusLake.readCorpusAt(spark, dir, parent)
      .select(org.apache.spark.sql.functions
          .expr("CAST(doc_id % 5 AS INT)").as("bucket"),
        org.apache.spark.sql.functions
          .expr("CAST(length(text) AS BIGINT)").as("chars"))
      .groupBy($"bucket")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum($"chars").as("chars"))
      .orderBy($"bucket").collect().map(_.toSeq).toSeq
    assert(viewGot == viewWant, "view diverged from the post-merge head")
    assert(CorpusLake.replicateLake(spark, dir, parent, replica)
      .exists(_._2 == vM))
    assert(served(replica) == served(parent),
      "replica diverged from the post-merge parent")

    // post-merge admission on the PARENT now flags near-dups of the
    // MERGED content — the bucket rows landed with the merge epoch
    val flagged = graft.operators.Dedup.dedupArrivalsFromSaved(spark, dir,
        Seq((9100001L, docC)).toDF("doc_id", "text"), dedupIdx,
        Some(s"$pMaint/buckets"),
        Some(CorpusLake.readCorpusAt(spark, dir, parent)))
      .select($"arriving_id", $"existing_id").as[(Long, Long)]
      .collect().toSet
    assert(flagged.contains((9100001L, 7100005L)),
      s"copy of merged content not flagged on the parent: $flagged")

    // the experiment is disposable: drop changes nothing downstream
    CorpusLake.dropBranch(spark, branch)
    assert(served(parent).exists(_._1 == 7100005L))
    assert(served(replica) == served(parent))

    // freshness DESCRIBE names every consumer kind: view and replica are
    // both at the post-merge head, lag zero
    val lag = CorpusLake.refreshLag(spark, parent,
        viewDirs = Seq(view), replicaDirs = Seq(replica))
      .select($"consumer", $"cursor_version", $"lag_commits")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(lag == Map("view:view" -> ((vM, 0L)),
      "replica:replica" -> ((vM, 0L))),
      s"freshness DESCRIBE wrong for view/replica: $lag")
    Caches.releaseAll()
  }
}

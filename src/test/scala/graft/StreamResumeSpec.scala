package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{CorpusLake, LakeView}

/** Same-checkpoint crash-resume equivalence for the FULL ingest stream
  * with declared views attached (the round-17 durability directive): a
  * [[CorpusLake.maintainCorpusStream]] writer that hard-dies MID-COMMIT
  * (data + decisions + bucket rows appended, manifest row NOT written,
  * writer lease stranded, streaming checkpoint without the batch's commit
  * marker) and restarts from the SAME checkpoint must converge to a lake
  * whose snapshot, change feed, manifest audit, AND per-view serve state
  * equal an uninterrupted twin's — with `viewRefreshEvery = 2`, so the
  * kill lands inside a partially-consumed view-refresh window.
  *
  * The crash state is reconstructed from the REAL artifacts a hard kill
  * leaves (the protocol's steps are all filesystem writes, so the death
  * state IS a directory state): run the stream through batch 2, then
  *   - delete the checkpoint's `commits/2` marker (the stream died after
  *     the foreachBatch body started; Structured Streaming replays
  *     batch 2 from `offsets/2` on restart),
  *   - delete the manifest part-file holding batch 2's row (the death
  *     happened AFTER the data appends, BEFORE the manifest commit — the
  *     appended docs/decisions/bucket rows stay behind as orphans carrying
  *     batch 2's writer tag),
  *   - re-create the stranded `_writer_lease` under batch 2's STABLE owner
  *     (`ingest-batch-2@<maintDir>` — the lease a hard-killed writer never
  *     released).
  * The restart must: reclaim the stranded lease by same-owner re-entry
  * (real checkpoint identity, not a simulated one), recompute batch 2's
  * admission against the same committed state, and re-commit at a FRESH
  * epoch — [[CorpusLake.nextLakeVersion]] steps OVER the dead attempt's
  * epoch-stamped orphans (the documented burn: re-using the number would
  * make the dead rows committed-visible the instant the manifest row
  * lands), so the orphans stay uncommitted-by-pair until vacuum reclaims
  * them. Logical content converges exactly; version NUMBERS shift by the
  * burned epoch, which this spec pins explicitly. */
class StreamResumeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private val dims = Seq("bucket" -> "CAST(doc_id % 5 AS INT)")
  private val measures = Seq(
    "chars" -> "CAST(length(text) AS BIGINT)",
    "toks" -> "CAST(size(split(text, ' ')) AS BIGINT)")

  /** 2 docs per file; unique 40-token texts (no shared shingles → every
    * doc admits; deterministic across the twin runs). The file source
    * orders batches by file MTIME (same-millisecond writes tie-break
    * unpredictably), so each file gets an explicit, strictly-increasing
    * timestamp — batch i IS file i in both twins. */
  private def writeBatchFile(inDir: String, i: Int): Unit = {
    def doc(k: Int): String = {
      val id = 8200000L + i * 10 + k
      val text = (1 to 40).map(j => s"rsm${i}x${k}w$j").mkString(" ")
      s"""{"doc_id": $id, "text": "$text"}"""
    }
    val p = Files.writeString(Paths.get(s"$inDir/batch$i.json"),
      doc(0) + "\n" + doc(1))
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
  }

  private def runStream(inDir: String, cp: String, idx: String,
      corpus: String, maint: String, views: Seq[String]): Unit = {
    val src = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: the
      .json(inDir)                     // batch→commit mapping is pinned
    val q = CorpusLake.maintainCorpusStream(src, spark, dir, idx, corpus,
        maint, optimizeEvery = 2, viewDirs = views, viewRefreshEvery = 2)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def mkViews(root: String): Seq[String] = {
    val vA = s"$root/view_a"
    val vQ = s"$root/view_q"
    LakeView.createView(spark, dir, vA, dims, measures)
    // a second view with non-additive legs (min/max/avg/quantile) + an
    // enrichment column: the ext store and the metadata join must survive
    // the crash-resume too (stream-born docs enrich to null → 'und')
    LakeView.createView(spark, dir, vQ,
      dims = Seq("src" -> "coalesce(lang, 'und')"),
      measures = Seq("chars" -> "CAST(length(text) AS BIGINT)"),
      minMeasures = Seq("min_len" -> "length(text)"),
      maxMeasures = Seq("max_len" -> "length(text)"),
      avgMeasures = Seq("avg_len" -> "CAST(length(text) AS DOUBLE)"),
      quantileMeasures = Seq(
        ("p50_len", "CAST(length(text) AS DOUBLE)", 0.5)),
      baseCols = Seq("lang"))
    Seq(vA, vQ)
  }

  private def viewRows(v: String): Set[Seq[Any]] =
    LakeView.readView(spark, v).collect().map(_.toSeq.map {
      // double legs (avg/quantile): partial-agg addition order is not
      // pinned across runs, so compare at the oracle's 6 dp convention
      case d: Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      case x => x
    }).toSet

  private def snapshotRows(corpus: String, v: Option[Long] = None) =
    CorpusLake.readCorpusAt(spark, dir, corpus, v)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  /** Manifest audit rows keyed by batch id (versions shift by the burned
    * epoch; committed_at and the maintDir-scoped commit_tag are
    * run-identity, not content). */
  private def manifestByBatch(corpus: String) =
    CorpusLake.manifest(spark, corpus)
      .select(col("batch_id"), col("n_arrived"), col("n_admitted"),
        col("n_duplicate"), col("n_contaminated"), col("n_low_quality"),
        col("n_deleted"), col("n_invalid"))
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])

  private def manifestVersions(corpus: String) =
    CorpusLake.manifest(spark, corpus)
      .select(col("version")).collect().map(_.getLong(0)).toSeq.sorted

  private def changeRows(corpus: String) =
    CorpusLake.readCorpusChanges(spark, dir, corpus, Long.MinValue)
      .select(col("doc_id"), col("text"), col("change_type"))
      .collect().map(_.toSeq).toSet

  private def statOf(corpus: String, name: String): Long =
    CorpusLake.lakeStats(spark, corpus)
      .filter(col("stat") === name).select(col("value"))
      .collect().head.getLong(0)

  test("ingest stream hard-killed mid-commit resumes from the same " +
      "checkpoint (views attached, partially-consumed refresh window) " +
      "and converges to the uninterrupted twin") {
    graft.sources.Caches.releaseAll()
    val root = Files.createTempDirectory("graft-resume").toString
    val twin = Files.createTempDirectory("graft-resume-twin").toString

    // ---- interrupted lake: 3 batches, hard-crash at batch 2, resume
    val (idx, corpus, maint, cp, inDir) = (s"$root/idx", s"$root/corpus",
      s"$root/maint", s"$root/cp", s"$root/in")
    Files.createDirectories(Paths.get(inDir))
    CorpusLake.initCorpus(spark, dir, idx)
    val views = mkViews(root)
    (0 to 2).foreach(writeBatchFile(inDir, _))
    runStream(inDir, cp, idx, corpus, maint, views)
    assert(CorpusLake.manifest(spark, corpus).count() == 3,
      "setup: three batches must have committed before the crash")
    // viewRefreshEvery=2 fired at batch 1; batch 2 left the window
    // PARTIALLY consumed (counter = 1 at the kill point) — the views lag
    // the lake head by one commit, the knob's documented trade

    // ---- reconstruct the hard-death state (see class scaladoc)
    assert(Files.deleteIfExists(Paths.get(s"$cp/commits/2")),
      "setup: the checkpoint must hold batch 2's commit marker")
    // the local ChecksumFileSystem's sidecar must go WITH the marker: a
    // stale .2.crc makes the restarted query's commit-log write look like
    // a concurrent writer and kills the stream
    Files.deleteIfExists(Paths.get(s"$cp/commits/.2.crc"))
    val manifestFs = new org.apache.hadoop.fs.Path(s"$corpus/manifest")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val manifestFiles = {
      val it = manifestFs.listFiles(
        new org.apache.hadoop.fs.Path(s"$corpus/manifest"), true)
      val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) out += p
      }
      out.toSeq
    }
    val dropped = manifestFiles.count { f =>
      val rows = spark.read.parquet(f.toString)
      val n = rows.count()
      val all2 = n > 0 && rows.filter(col("batch_id") === 2L).count() == n
      if (all2) manifestFs.delete(f, false)
      all2
    }
    assert(dropped == 1,
      s"setup: exactly one manifest part-file holds batch 2's row ($dropped)")
    assert(CorpusLake.manifest(spark, corpus).count() == 2,
      "setup: the lake must read as 2 committed epochs after the rollback")
    // batch 2's appended rows are now orphans; the DESCRIBE surface and
    // the committed serve must both already tell the truth
    assert(statOf(corpus, "uncommitted_epochs") == 1L,
      "the mid-commit death's orphan epoch must show in lakeStats")
    val idsPostCrash = snapshotRows(corpus).map(_._1)
    assert(!idsPostCrash.contains(8200020L) && !idsPostCrash.contains(8200021L),
      "the orphan epoch must not serve")
    Files.writeString(Paths.get(s"$corpus/_writer_lease"),
      s"ingest-batch-2@$maint") // the lease the dead writer never released

    // ---- resume from the SAME checkpoint with two more files pending
    (3 to 4).foreach(writeBatchFile(inDir, _))
    runStream(inDir, cp, idx, corpus, maint, views)

    // ---- uninterrupted twin: same five files, one run
    val (tIdx, tCorpus, tMaint, tCp, tIn) = (s"$twin/idx", s"$twin/corpus",
      s"$twin/maint", s"$twin/cp", s"$twin/in")
    Files.createDirectories(Paths.get(tIn))
    CorpusLake.initCorpus(spark, dir, tIdx)
    val tViews = mkViews(twin)
    (0 to 4).foreach(writeBatchFile(tIn, _))
    runStream(tIn, tCp, tIdx, tCorpus, tMaint, tViews)

    // ---- equivalence: manifest audit, head snapshot, time travel,
    // change feed, orphan accounting, and EVERY view's served rows
    assert(manifestByBatch(corpus) == manifestByBatch(tCorpus),
      "resumed manifest audit diverged from the uninterrupted twin")
    // the burned epoch, pinned: the replayed batch re-committed at a FRESH
    // version (2 is forever the dead attempt's) — twin stays dense
    assert(manifestVersions(corpus) == Seq(0L, 1L, 3L, 4L, 5L),
      s"resumed versions: ${manifestVersions(corpus)}")
    assert(manifestVersions(tCorpus) == Seq(0L, 1L, 2L, 3L, 4L),
      s"twin versions: ${manifestVersions(tCorpus)}")
    assert(snapshotRows(corpus) == snapshotRows(tCorpus),
      "resumed head snapshot diverged from the twin")
    // pre-crash prefix aligns version-exactly; post-recommit states align
    // across the burn (resumed@3 ≡ twin@2: both = batches 0,1,2)
    assert(snapshotRows(corpus, Some(1L)) == snapshotRows(tCorpus, Some(1L)),
      "time travel before the crash point diverged from the twin")
    assert(snapshotRows(corpus, Some(3L)) == snapshotRows(tCorpus, Some(2L)),
      "time travel at the re-committed batch diverged from the twin")
    assert(changeRows(corpus) == changeRows(tCorpus),
      "resumed change feed diverged from the twin")
    // the dead attempt's rows stay orphans (uncommitted BY PAIR: epoch 2
    // has no manifest row; the recommit landed at 3 under the same tag)
    assert(statOf(corpus, "uncommitted_epochs") == 1L,
      "the burned epoch's orphans must stay visible to the DESCRIBE surface")
    assert(CorpusLake.admissionLog(spark, corpus).count() ==
        CorpusLake.admissionLog(spark, tCorpus).count(),
      "orphaned decisions leaked into the committed admission log")
    // views: both lakes get the same final standalone catch-up (the
    // refresh-cadence phase is equalized at the head; a double-applied
    // crash delta would survive the catch-up and fail the compare)
    LakeView.refreshViews(spark, dir, corpus, views)
    LakeView.refreshViews(spark, dir, tCorpus, tViews)
    views.zip(tViews).foreach { case (v, tv) =>
      assert(viewRows(v) == viewRows(tv),
        s"view ${v.split('/').last} diverged from the uninterrupted twin")
    }
    // vacuum reclaims exactly the dead attempt's orphans and changes
    // nothing any reader serves
    val snapBefore = snapshotRows(corpus)
    val viewsBefore = views.map(viewRows)
    CorpusLake.vacuumCorpus(spark, corpus, 0L)
    assert(snapshotRows(corpus) == snapBefore,
      "post-resume vacuum must not change the served snapshot")
    assert(statOf(corpus, "uncommitted_epochs") == 0L,
      "vacuum must reclaim the burned epoch's orphans")
    assert(views.map(viewRows) == viewsBefore,
      "vacuum must not change any view's served rows")
    graft.sources.Caches.releaseAll()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.{CorpusLake, LakeView}
import graft.sources.Tables

/** Crash-point injection across the lake's commit protocol (the round-17
  * durability directive): a writer that hard-DIES (not aborts) at each
  * protocol step boundary leaves a directory state — every step is a
  * filesystem write, so the death state IS reconstructible on disk. For
  * each point this spec builds that exact state, asserts the READER
  * INVARIANT SUITE against it (committed-only serve, time travel, change
  * feed, lakeStats accounting), and then runs the takeover-then-resume
  * path and asserts the lake converges.
  *
  * Points covered (the protocol's write order, [[CorpusLake]] scaladoc):
  *   1. after data append / before manifest row (mid-commit death)
  *   2. mid-OPTIMIZE rewrite (partial `*_compacting`, no `_SUCCESS`)
  *      and between its delete and rename (completed `*_compacting`,
  *      main store gone — the store-pointer flip's torn middle)
  *   3. mid-VACUUM: after the retention-marker swap / before the store
  *      rewrite, and mid-rewrite (partial compacting dir)
  *   4. mid-VIEW-FOLD ([[LakeView.compactView]]): base swapped, delta/ext
  *      stores not yet truncated — and the base swap's own torn middle.
  *
  * Reference behavior to beat: the reference's crash story is
  * "at-least-once + PK upsert" (cassandra_sink.scala:30-34,71-77); the
  * lake claims committed-only serve at EVERY step boundary and this spec
  * proves it point by point. */
class CrashPointSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def baseDocs = Tables.spread(Tables.documents(spark, dir))
    .select(col("doc_id"), col("text"))

  private def commitTo(corpus: String, v: Long): Unit = {
    import spark.implicits._
    Seq((v, 0L, 0L, 0L, 0L, 0L))
      .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
        "n_contaminated", "n_low_quality")
      .write.mode("append").parquet(s"$corpus/manifest")
  }

  /** Lake with two committed epochs: v0 = " u1" updates (ids ≡1 mod 10),
    * v1 = " u2" updates (ids ≡3 mod 10) — the LakeViewSpec fixture shape,
    * epoch-only legacy commits (untagged writes stay a supported path). */
  private def mkLake(): String = {
    import spark.implicits._
    val corpus = Files.createTempDirectory("graft-crash").toString + "/corpus"
    baseDocs.filter($"doc_id" % 10 === 1)
      .select($"doc_id", concat($"text", lit(" u1")).as("text"),
        lit(0L).as("epoch"))
      .write.mode("append").parquet(s"$corpus/docs")
    commitTo(corpus, 0L)
    baseDocs.filter($"doc_id" % 10 === 3)
      .select($"doc_id", concat($"text", lit(" u2")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$corpus/docs")
    commitTo(corpus, 1L)
    corpus
  }

  private def snapshot(corpus: String, v: Option[Long] = None) =
    CorpusLake.readCorpusAt(spark, dir, corpus, v)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def changes(corpus: String, from: Long = Long.MinValue) =
    CorpusLake.readCorpusChanges(spark, dir, corpus, from)
      .select(col("doc_id"), col("text"), col("change_type"))
      .collect().map(_.toSeq).toSet

  private def statOf(corpus: String, name: String): Long =
    CorpusLake.lakeStats(spark, corpus)
      .filter(col("stat") === name).select(col("value"))
      .collect().head.getLong(0)

  /** The reader invariant suite: the whole read surface against an
    * expected (snapshot, time-travel, change-feed) truth. */
  private def assertReaders(corpus: String, label: String,
      wantHead: Set[(Long, String)], wantAt1: Set[(Long, String)],
      wantChanges: Set[Seq[Any]], wantUncommitted: Long): Unit = {
    assert(snapshot(corpus) == wantHead, s"$label: head snapshot diverged")
    assert(snapshot(corpus, Some(1L)) == wantAt1,
      s"$label: time travel at v1 diverged")
    assert(changes(corpus) == wantChanges, s"$label: change feed diverged")
    assert(statOf(corpus, "uncommitted_epochs") == wantUncommitted,
      s"$label: lakeStats uncommitted_epochs diverged")
  }

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Recursive dir copy (crash-state reconstruction needs byte copies of
    * pre-fold stores). */
  private def copyDir(src: String, dst: String): Unit = {
    val s = Paths.get(src)
    Files.walk(s).forEach { p =>
      val t = Paths.get(dst).resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private def deleteDir(path: String): Unit =
    fsOf(path).delete(new org.apache.hadoop.fs.Path(path), true)

  test("crash point 1: death after data append, before manifest — " +
      "orphans never serve; a TTL takeover resumes; vacuum reclaims") {
    import spark.implicits._
    val corpus = mkLake()
    val head = snapshot(corpus)
    val at1 = snapshot(corpus, Some(1L))
    val ch = changes(corpus)
    // the death state: epoch-2 docs + decisions rows appended, tagged by
    // the dead writer; NO manifest row; its lease stranded and stale
    baseDocs.filter($"doc_id" % 10 === 7).limit(5)
      .select($"doc_id", concat($"text", lit(" DEAD")).as("text"),
        lit(2L).as("epoch"), lit("dead-writer@crash1").as("_commit"))
      .write.mode("append").parquet(s"$corpus/docs")
    Seq((999001L, "admitted", 0L, 2L))
      .toDF("doc_id", "decision", "n_dup_matches", "epoch")
      .withColumn("_commit", lit("dead-writer@crash1"))
      .write.mode("append").parquet(s"$corpus/decisions")
    Files.writeString(Paths.get(s"$corpus/_writer_lease"),
      "dead-writer@crash1")
    CorpusLake.backdateWriterLease(spark, corpus,
      ageMs = 16L * 60 * 1000) // past the 15-min default TTL
    assertReaders(corpus, "post-death", head, at1, ch, wantUncommitted = 1L)
    // takeover-then-resume: a REAL writer (deleteDocs runs under
    // withOpLease) steals the stale lease and commits the next epoch —
    // which must step OVER the dead attempt's epoch, not adopt its rows
    val delIds = baseDocs.filter($"doc_id" % 10 === 1).limit(2)
      .select($"doc_id")
    val deleted = delIds.as[Long].collect().toSet
    CorpusLake.deleteDocs(spark, corpus, delIds)
    assert(!Files.exists(Paths.get(s"$corpus/_writer_lease")),
      "the takeover writer must release the lease it stole")
    val headAfter = head.filterNot { case (id, _) => deleted(id) }
    assert(snapshot(corpus) == headAfter,
      "takeover commit diverged (orphan adoption or lost delete)")
    assert(CorpusLake.manifest(spark, corpus)
        .agg(max(col("version"))).as[Long].head() == 3L,
      "the takeover writer must burn the dead attempt's epoch, not reuse it")
    assert(statOf(corpus, "uncommitted_epochs") == 1L,
      "the dead attempt's orphans survive until vacuum — visibly")
    CorpusLake.vacuumCorpus(spark, corpus, 0L)
    assert(snapshot(corpus) == headAfter,
      "vacuum changed the served snapshot")
    assert(statOf(corpus, "uncommitted_epochs") == 0L,
      "vacuum must reclaim the dead attempt's orphans")
  }

  test("crash point 2: death mid-OPTIMIZE — a torn rewrite never serves; " +
      "the interrupted pointer flip self-heals; a re-run completes") {
    import spark.implicits._
    val corpus = mkLake()
    val head = snapshot(corpus)
    val at1 = snapshot(corpus, Some(1L))
    val ch = changes(corpus)
    // (a) died MID-REWRITE: a partial docs_compacting without _SUCCESS —
    // poisoned content proves promotion would be visible (and must not
    // happen)
    Seq((424242L, "POISON", 0L)).toDF("doc_id", "text", "epoch")
      .write.mode("overwrite").parquet(s"$corpus/docs_compacting")
    Files.deleteIfExists(Paths.get(s"$corpus/docs_compacting/_SUCCESS"))
    assertReaders(corpus, "mid-rewrite death", head, at1, ch, 0L)
    // resume: the re-run overwrites the torn dir and completes the swap
    CorpusLake.optimizeCorpus(spark, corpus)
    assertReaders(corpus, "optimize re-run", head, at1, ch, 0L)
    // (b) died between the swap's delete and rename: the completed
    // compacting dir IS the store, main is gone — the next reader promotes
    val fs = fsOf(corpus)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$corpus/docs"),
      new org.apache.hadoop.fs.Path(s"$corpus/docs_compacting")))
    assertReaders(corpus, "torn pointer flip", head, at1, ch, 0L)
    assert(Files.exists(Paths.get(s"$corpus/docs")),
      "the first read must complete the interrupted swap (promote)")
  }

  test("crash point 3: death mid-VACUUM — floor lands, stores intact; " +
      "readers below the floor refuse; the resumed vacuum completes") {
    import spark.implicits._
    val corpus = mkLake()
    // an orphan for the vacuum to reclaim: a dead attempt at epoch 2,
    // BURNED by a later writer's committed epoch 3 (orphans ≤ the
    // committed head are provably dead — vacuum's reclaim criterion;
    // above-head orphans are a live stream's in-flight epoch and are
    // deliberately kept)
    baseDocs.filter($"doc_id" % 10 === 9).limit(3)
      .select($"doc_id", concat($"text", lit(" DEAD")).as("text"),
        lit(2L).as("epoch"))
      .write.mode("append").parquet(s"$corpus/docs")
    baseDocs.filter($"doc_id" % 10 === 5)
      .select($"doc_id", concat($"text", lit(" u3")).as("text"),
        lit(3L).as("epoch"))
      .write.mode("append").parquet(s"$corpus/docs")
    commitTo(corpus, 3L)
    val head = snapshot(corpus)
    val at1 = snapshot(corpus, Some(1L))
    val ch1 = changes(corpus, from = 1L)
    assert(statOf(corpus, "uncommitted_epochs") == 1L)
    // (a) died right after vacuum's FIRST step (the retention-marker
    // write, before its swap completed — the exact two-write protocol
    // vacuumCorpus runs): only `retention_compacting` exists, with its
    // committer _SUCCESS. The floor is law the instant any reader's
    // resolveArtifact promotes it; the stores are untouched.
    Seq(1L).toDF("min_version")
      .write.mode("overwrite").parquet(s"$corpus/retention_compacting")
    assert(snapshot(corpus) == head,
      "marker-swap death: head serve must be unaffected")
    assert(statOf(corpus, "retention_floor") == 1L,
      "the half-landed retention marker must be promoted and visible")
    intercept[Exception] { // below-floor history is GONE by contract
      snapshot(corpus, Some(0L))
    }
    intercept[Exception] {
      CorpusLake.readCorpusChanges(spark, dir, corpus, 0L).count()
    }
    assert(snapshot(corpus, Some(1L)) == at1,
      "at-floor time travel must survive the marker-swap death")
    assert(changes(corpus, from = 1L) == ch1,
      "above-floor change feed must survive the marker-swap death")
    // (b) died mid-store-rewrite: partial docs_compacting, no _SUCCESS
    Seq((424242L, "POISON", 0L)).toDF("doc_id", "text", "epoch")
      .write.mode("overwrite").parquet(s"$corpus/docs_compacting")
    Files.deleteIfExists(Paths.get(s"$corpus/docs_compacting/_SUCCESS"))
    assert(snapshot(corpus) == head,
      "mid-rewrite death: the torn vacuum rewrite must not serve")
    // resume: the re-run vacuum (same floor — floors only rise) completes
    val (before, after) = CorpusLake.vacuumCorpus(spark, corpus, 1L)
    assert(after < before, "the resumed vacuum must reclaim the orphans")
    assert(snapshot(corpus) == head,
      "the resumed vacuum changed the served snapshot")
    assert(snapshot(corpus, Some(1L)) == at1,
      "the resumed vacuum changed the at-floor snapshot")
    assert(statOf(corpus, "uncommitted_epochs") == 0L,
      "the resumed vacuum must reclaim the dead attempt's orphans")
    assert(changes(corpus, from = 1L) == ch1,
      "the resumed vacuum changed the above-floor change feed")
  }

  test("crash point 5: death around the generation-pointer OPTIMIZE — an " +
      "unflipped generation never serves; a torn pointer flip self-heals; " +
      "reclaim honors the drain window and the pointer's own generation") {
    import spark.implicits._
    val corpus = mkLake()
    val head = snapshot(corpus)
    val at1 = snapshot(corpus, Some(1L))
    val ch = changes(corpus)
    // (a) died AFTER the gen dir was fully written, BEFORE the pointer
    // flip: a complete (committed, _SUCCESS-bearing) docs_gen_1 full of
    // poison — with no store_head row naming it, no reader may resolve
    // into it, and the re-run OPTIMIZE must overwrite it unbothered
    Seq((424242L, "POISON", 0L)).toDF("doc_id", "text", "epoch")
      .write.mode("overwrite").parquet(s"$corpus/docs_gen_1")
    assertReaders(corpus, "unflipped generation", head, at1, ch, 0L)
    CorpusLake.optimizeCorpusVersioned(spark, corpus)
    assertReaders(corpus, "versioned optimize re-run", head, at1, ch, 0L)
    assert(!snapshot(corpus).exists(_._1 == 424242L),
      "the re-run flip must supersede the dead attempt's poison gen")
    // (b1) died MID-POINTER-WRITE: a torn store_head_compacting (no
    // _SUCCESS) beside the live pointer — readers must keep the OLD
    // pointer, never promote the torn row set
    Seq(("docs", 999L, 0L)).toDF("store", "gen", "flipped_at")
      .write.mode("overwrite").parquet(s"$corpus/store_head_compacting")
    Files.deleteIfExists(Paths.get(s"$corpus/store_head_compacting/_SUCCESS"))
    assertReaders(corpus, "torn pointer write", head, at1, ch, 0L)
    deleteDir(s"$corpus/store_head_compacting")
    // (b2) died BETWEEN the pointer swap's delete and rename: the
    // completed compacting dir IS the pointer, main is gone — the next
    // reader promotes it and serves identically
    val fs = fsOf(corpus)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$corpus/store_head"),
      new org.apache.hadoop.fs.Path(s"$corpus/store_head_compacting")))
    assertReaders(corpus, "torn pointer flip", head, at1, ch, 0L)
    assert(Files.exists(Paths.get(s"$corpus/store_head")),
      "the first read must complete the interrupted pointer swap")
    // (c) reclaim vs the drain window and in-flight readers: a reader
    // PLANNED against the superseded legacy store must finish while the
    // flip is younger than the drain window (reclaim deletes nothing) —
    // the enforceable no-retry contract long-running scans rely on
    val planned = spark.read.parquet(s"$corpus/docs") // legacy gen-0 path
    assert(CorpusLake.reclaimStoreGenerations(spark, corpus,
        minAgeMs = 60L * 60 * 1000) == 0L,
      "reclaim inside the drain window must delete nothing")
    assert(planned.count() > 0L,
      "the in-flight reader's planned generation must survive the window")
    // a second flip stacks gen 2 over gen 1; death MID-RECLAIM is a
    // prefix of the stale-dir deletes — simulate it (legacy dir gone,
    // gen_1 still present), assert serve is unaffected, then the re-run
    // reclaim finishes the job and NEVER deletes the pointer's own gen
    CorpusLake.optimizeCorpusVersioned(spark, corpus)
    assertReaders(corpus, "second flip", head, at1, ch, 0L)
    deleteDir(s"$corpus/docs") // the dead reclaim's first delete
    assertReaders(corpus, "mid-reclaim death", head, at1, ch, 0L)
    assert(CorpusLake.reclaimStoreGenerations(spark, corpus) > 0L,
      "the resumed reclaim must drop the remaining superseded dirs")
    assertReaders(corpus, "reclaim resumed", head, at1, ch, 0L)
    assert(Files.exists(Paths.get(s"$corpus/docs_gen_2")),
      "reclaim must never delete the generation the pointer names")
    assert(!Files.exists(Paths.get(s"$corpus/docs_gen_1")),
      "the resumed reclaim must finish the dead attempt's prefix")
    // and the lake still commits + vacuums through the pointer afterwards
    val delIds = baseDocs.filter($"doc_id" % 10 === 3).limit(2)
      .select($"doc_id")
    val deleted = delIds.as[Long].collect().toSet
    CorpusLake.deleteDocs(spark, corpus, delIds)
    assert(snapshot(corpus) == head.filterNot { case (id, _) => deleted(id) },
      "post-reclaim commit through the pointer diverged")
  }

  test("crash point 4: death mid-VIEW-FOLD — base swapped, delta/ext not " +
      "truncated: serve is unchanged; the resumed fold is idempotent") {
    val corpus = mkLake()
    val root = corpus.stripSuffix("/corpus")
    val view = s"$root/view"
    // non-additive legs too: the fold's THIRD swap (ext) must be covered
    LakeView.createView(spark, dir, view,
      dims = Seq("bucket" -> "CAST(doc_id % 5 AS INT)"),
      measures = Seq("chars" -> "CAST(length(text) AS BIGINT)"),
      minMeasures = Seq("min_len" -> "length(text)"),
      quantileMeasures = Seq(
        ("p50_len", "CAST(length(text) AS DOUBLE)", 0.5)))
    LakeView.refreshViewFromLake(spark, dir, corpus, view)
    def serve() = LakeView.readView(spark, view).collect()
      .map(_.toSeq.map {
        case d: Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        case x => x
      }).toSet
    val want = serve()
    // byte-copy the pre-fold delta/ext stores, run the REAL fold, then
    // restore them — the exact on-disk state of a writer that died after
    // the base swap, before the delta/ext truncations
    val saved = Files.createTempDirectory("graft-prefold").toString
    copyDir(s"$view/delta", s"$saved/delta")
    copyDir(s"$view/ext", s"$saved/ext")
    LakeView.compactView(spark, view)
    assert(serve() == want, "the completed fold changed the serve")
    deleteDir(s"$view/delta"); deleteDir(s"$view/ext")
    copyDir(s"$saved/delta", s"$view/delta")
    copyDir(s"$saved/ext", s"$view/ext")
    assert(serve() == want,
      "mid-fold death (stale delta/ext beside the folded base) leaked " +
        "into the serve — the fold watermark must hide folded versions")
    intercept[Exception] { // folded history refuses, even mid-crash
      LakeView.readViewAt(spark, view, 0L).count()
    }
    // resume: the re-run fold collapses the stale stores; serve unchanged
    LakeView.compactView(spark, view)
    assert(serve() == want, "the resumed fold changed the serve")
    assert(spark.read.parquet(s"$view/delta").count() == 0L,
      "the resumed fold must truncate the stale delta store")
    // the base swap's own torn middle: completed base_compacting, base
    // gone — the next read promotes and serves identically
    val fs = fsOf(view)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$view/base"),
      new org.apache.hadoop.fs.Path(s"$view/base_compacting")))
    assert(serve() == want, "torn base swap: the read must promote and serve")
    assert(Files.exists(Paths.get(s"$view/base")),
      "the read must complete the interrupted base swap")
  }
}

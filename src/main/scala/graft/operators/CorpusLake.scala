package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.functions.Text.tokens
import graft.sources.Tables

/** The versioned training-corpus lake: admission-gated ingest with a
  * manifest-last commit protocol and manifest-pinned time travel.
  *
  * This is the capstone the index-lifecycle rounds were building toward —
  * the corpus ITSELF becomes a maintained artifact, not just the indexes
  * over it. Each arriving crawl micro-batch passes the full admission gate
  * ([[Curate.admitRows]]: near-dup vs the persisted MinHash-LSH index ∪
  * everything admitted so far, benchmark 8-gram decontamination, quality
  * floor), and only admitted rows enter the lake:
  *
  * {{{
  *   corpusDir/docs/       epoch-stamped admitted (doc_id, text, epoch)
  *   corpusDir/decisions/  epoch-stamped per-doc audit (every arrival)
  *   corpusDir/manifest/   ONE row per committed epoch — written LAST
  *   maintDir/buckets/     the admitted docs' LSH bucket rows (the dedup
  *                         index delta, so batch N+1 dedups against batch
  *                         N's admissions; compacted into the base index
  *                         at the delta-fraction threshold)
  * }}}
  *
  * Commit protocol: data partitions first, the manifest row last. A crash
  * at ANY point leaves either (a) a manifest-less partial epoch — invisible,
  * because every read semi-joins the committed manifest — or (b) a fully
  * committed epoch. Structured Streaming then replays the uncommitted
  * epoch: the admission decision is idempotent by construction (every
  * index-side relation is filtered to COMMITTED epochs, so the crashed
  * attempt's manifest-less appends cannot flip a verdict), and the
  * replayed byte-identical rows collapse in the (doc_id, epoch) read
  * dedup. This is
  * the transaction-log discipline a table format (Delta/Iceberg) provides,
  * built from the primitives the library already verifies — at 100 TB the
  * manifest is a few KB per epoch and every reader prunes to committed
  * epochs before touching data files. Because every commit appends one
  * small file, the manifest read itself accretes a per-commit listing
  * cost; [[compactManifest]] (the Delta-checkpoint analogue) rewrites the
  * history into O(1) files under the same generation-pointer convention
  * as the data stores, keeping head resolution commit-count-independent.
  *
  * Concurrency model: single maintenance writer, many readers. Plain
  * appends are always safe to read beside. The maintenance REWRITES
  * (incremental pack truncation, deep OPTIMIZE, vacuum) end in a
  * delete→rename swap: a reader that PLANS after the swap is correct by
  * `resolveArtifact`, but a cross-session scan in flight across the swap
  * instant can hit vanished files and must retry — the standard
  * swap-rewrite trade. Serving stacks that cannot tolerate a retry use
  * the store-GENERATION layout instead ([[optimizeCorpusVersioned]] —
  * the [[Similarity.retrainIndex]] versioned-dir convention applied to
  * the lake): the rewrite lands in `<store>_gen_<k+1>`, the
  * `store_head` pointer flips, the old generation keeps serving every
  * scan that already planned against it, and disk is reclaimed
  * explicitly ([[reclaimStoreGenerations]]) after the operator's drain
  * window. The in-place swaps remain for stacks that prefer zero dir
  * growth; the inline incremental cadence guarantees no WRITER races
  * either rewrite, because it runs inside the serialized foreachBatch
  * slot. ACROSS processes the single-writer discipline is enforced by
  * the advisory maintenance lease ([[acquireWriterLease]] /
  * [[withWriterLease]]): atomic-create exclusivity, TTL takeover for
  * crashed holders, pre-commit re-verification ([[heldWriterLease]])
  * for long rewrites.
  *
  * Versioning: the committed epoch IS the version. [[readCorpusAt]] pins a
  * version v and serves base ∪ admitted(epoch ≤ v), doc-level latest-epoch-
  * wins — the KeyedUpsertSink LWW convention (reference semantics:
  * cassandra_sink.scala:30-34's sole-PK upsert), so a changed re-upload
  * under the same doc_id replaces its document from its epoch onward while
  * older versions still serve the older text. */
object CorpusLake {

  /** Bootstrap the lake next to an existing corpus: persist the corpus-side
    * dedup index ([[Dedup.saveDedupIndex]]). The base corpus needs no copy —
    * reads union it from `dir` directly; only the index is materialized. */
  def initCorpus(spark: SparkSession, dir: String, indexDir: String): Unit =
    Dedup.saveDedupIndex(spark, dir, indexDir)

  /** Verified near-dup pairs of the arriving batch against ITSELF, earlier
    * doc_id wins: the "dedup the batch as a set, first occurrence survives"
    * leg of admission ([[Curate.admission]]'s `y.doc_id < x.doc_id`
    * predicate, verbatim). Pure per-batch work — signs the batch once,
    * bucket self-join, exact verify via [[Dedup.verifyJaccard]]. */
  private[graft] def intraBatchPairs(batch: DataFrame): DataFrame = {
    val s = Dedup.signRows(batch)
    val bb = Dedup.bucketRows(s)
    val cand = bb.as("x").join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("y.doc_id") < col("x.doc_id"))
      .select(col("x.doc_id").as("arriving_id"),
        col("y.doc_id").as("existing_id"))
      .distinct()
    Dedup.verifyJaccard(cand,
      s.select(col("doc_id").as("arriving_id"), col("grams").as("gr_a"),
        size(col("grams")).as("na")),
      s.select(col("doc_id").as("existing_id"), col("grams").as("gr_b"),
        size(col("grams")).as("nb")))
  }

  /** Admission decisions for one arriving batch against the lake state:
    * dup leg = persisted index ∪ the admitted-so-far delta store pruned to
    * COMMITTED epochs ∪ the intra-batch first-wins leg; contamination +
    * quality via [[Curate.admitRows]]. Replay idempotency comes from the
    * committed-epoch filter, not from excluding the batch's own ids: a
    * crashed attempt's appends are manifest-less and therefore invisible
    * on the index side, while a GENUINE committed doc that happens to be
    * re-sent in this batch still counts as existing content — so a new
    * near-dup of it is rejected even when they share a batch, and the
    * re-send itself passes as the LWW update (self-pairs are excluded by
    * id). `admittedDocs` is the lake's committed admitted relation for
    * candidate verification (raw epoch-stamped rows — the serve prunes to
    * candidates before resolving latest-wins). */
  private[graft] def admitBatch(spark: SparkSession, dir: String,
      batch: DataFrame, indexDir: String, storeDir: Option[String],
      admittedDocs: Option[DataFrame], benchPost: DataFrame,
      committedEpochs: Option[DataFrame] = None,
      expectations: Seq[(String, org.apache.spark.sql.Column)] = Nil,
      sharedStores: Seq[(String, Option[Long])] = Nil)
      : DataFrame = {
    val vsIndex = Dedup.dedupArrivalsFromSaved(spark, dir, batch, indexDir,
        storeDir, admittedDocs, committedEpochs, sharedStores)
      .select(col("arriving_id"), col("existing_id"))
    val dupPairs = vsIndex.unionByName(
      intraBatchPairs(batch).select(col("arriving_id"), col("existing_id")))
    Curate.admitRows(batch, dupPairs, benchPost, expectations)
  }

  /** Replay-safe read of the lake's admitted docs: byte-identical replay
    * copies collapse on (doc_id, epoch); committed-epoch filtering is the
    * CALLER's job (pass through [[committedOnly]]). Resolves an interrupted
    * [[vacuumCorpus]] swap first — the lake's data dirs are mutable at
    * exactly that boundary. */
  /** Recursive, schema-merging read of a lake store dir. Recursive: the
    * store may hold flat per-epoch appends, a `live/` append sub-store,
    * and `packed_*` segments ([[optimizeCorpusIncremental]]) side by
    * side; mid-crash a `live_compacting` twin may coexist with `live` —
    * its rows are a byte-identical subset, collapsed by the callers'
    * (key, epoch) dedup like every replay overlap. mergeSchema: epochs
    * may carry EVOLVED schemas (extra metadata columns added mid-stream)
    * — older epochs serve nulls there. The footer-union cost is
    * file-count-proportional, which the OPTIMIZE passes bound. */
  /** One-row cursor artifact read (max last_version), listing-signature
    * memoized: every refresh path re-reads its cursor per firing — a
    * schema-inference job plus a max() collect each time; the cursor
    * swap rewrites the dir, so the signature invalidates at the write. */
  private[operators] def cursorValue(spark: SparkSession,
      cPath: String): Long = {
    import spark.implicits._
    graft.sources.Caches.bySignature[Long](spark, "lake_cursor", cPath) {
      spark.read.parquet(cPath).agg(max(col("last_version"))).as[Long].head()
    }
  }

  private[graft] def readStore(spark: SparkSession, corpusDir: String,
      name: String): Option[DataFrame] = {
    val p = Similarity.resolveArtifact(spark, corpusDir,
      storeName(spark, corpusDir, name))
    if (!graft.sources.Formats.pathExists(spark, p)) None
    // listing-signature memo (same contract as the manifest read above):
    // the mergeSchema footer union is a 32-task Spark job per call and a
    // snapshot serve opens the docs store at least twice; any append or
    // rewrite under the store dir changes the signature and re-reads
    else Some(graft.sources.Caches.bySignature[DataFrame](spark,
        s"store_df|$name", p) {
      spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true").parquet(p)
    })
  }

  // ------------- store generations (pinned-path serving for no-retry readers)

  /** The CURRENT generation's directory name for a lake store — the
    * indirection that gives the lake the [[Similarity.retrainIndex]]
    * versioned-dir convention: a rewrite that must not strand in-flight
    * cross-session scans lands in `<name>_gen_<k+1>`
    * ([[optimizeCorpusVersioned]]) and flips the `store_head` pointer;
    * the PREVIOUS generation's files stay on disk untouched, so a scan
    * that planned against them finishes without a retry — old
    * generations are reclaimed explicitly ([[reclaimStoreGenerations]])
    * once in-flight readers have drained. No pointer → the legacy
    * in-place layout (`<name>` + `_compacting` swaps), unchanged. The
    * pointer itself is one KB-scale parquet row per store, swapped via
    * the `_compacting` protocol every reader resolves. */
  private[graft] def storeName(spark: SparkSession, corpusDir: String,
      name: String): String = {
    val p = Similarity.resolveArtifact(spark, corpusDir, "store_head")
    if (!graft.sources.Formats.pathExists(spark, p)) name
    else {
      import spark.implicits._
      // listing-signature memo: every store/manifest read resolves the
      // pointer first — without the memo that is one Spark job per
      // resolve on a one-row artifact (guide §5); a flip rewrites the
      // artifact dir, so the signature invalidates exactly then
      graft.sources.Caches.bySignature[String](spark,
          s"store_head|$name", p) {
        spark.read.parquet(p).filter(col("store") === name)
          .agg(max(col("gen"))).as[Option[Long]].head()
          .fold(name)(g => s"${name}_gen_$g")
      }
    }
  }

  private def storeGen(spark: SparkSession, corpusDir: String,
      name: String): Long = storeName(spark, corpusDir, name) match {
    case n if n == name => 0L
    case n => n.drop(name.length + "_gen_".length).toLong
  }

  /** The versioned deep OPTIMIZE — [[optimizeCorpus]] re-expressed for
    * serving stacks that cannot tolerate a mid-scan retry: each store's
    * rows are packed into a NEW `<name>_gen_<k+1>` directory (same
    * size-targeted (epoch, doc_id) range layout, same replay-collapse),
    * then ONE `store_head` pointer write flips both stores atomically-
    * enough (a reader resolves the pointer once at plan time and scans a
    * directory nobody will delete under it). The old generation keeps
    * serving every scan that already planned against it; nothing is
    * deleted here — disk is reclaimed by [[reclaimStoreGenerations]] on
    * the operator's quiet-window schedule. Appends follow the pointer
    * ([[liveTarget]]), so run this from the maintenance cadence like
    * every rewrite (an append landing mid-rewrite would land in the OLD
    * generation and vanish at the flip). Returns (files before, files
    * after). */
  def optimizeCorpusVersioned(spark: SparkSession, corpusDir: String,
      targetRowsPerFile: Long = 1L << 20): (Long, Long) = {
    import spark.implicits._
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    var (before, after) = (0L, 0L)
    val flipped = Seq.newBuilder[(String, Long)]
    for (name <- Seq("docs", "decisions")) {
      val cur = storeName(spark, corpusDir, name)
      val p = Similarity.resolveArtifact(spark, corpusDir, cur)
      if (graft.sources.Formats.pathExists(spark, p)) {
        val nextGen = storeGen(spark, corpusDir, name) + 1
        before += dataFileCount(spark, p)
        val raw0 = spark.read.option("mergeSchema", "true")
          .option("recursiveFileLookup", "true").parquet(p)
        val rows = raw0.dropDuplicates(replayKey(raw0))
        val n = rows.count()
        val nFiles = math.max(1L,
          (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
        rows.repartitionByRange(nFiles, col("epoch"), col("doc_id"))
          .sortWithinPartitions(col("epoch"), col("doc_id"))
          .write.mode("overwrite")
          .parquet(s"$corpusDir/${name}_gen_$nextGen")
        after += dataFileCount(spark, s"$corpusDir/${name}_gen_$nextGen")
        flipped += name -> nextGen
      }
    }
    flipStoreHead(spark, corpusDir, flipped.result())
    (before, after)
  }

  /** Flip the `store_head` pointer to the given (store, gen) entries,
    * carrying forward current entries for stores not flipped this pass.
    * One KB-scale write through the `_compacting` swap. */
  private def flipStoreHead(spark: SparkSession, corpusDir: String,
      flipped: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    if (flipped.isEmpty) return
    val cur = flipped.toMap
    // per-store flip instant: reclaim's drain window must measure from
    // the flip that SUPERSEDED a generation, not from the old dir's own
    // last write (the flip never touches the old dir, so an idle store
    // would otherwise be reclaimable the instant it is superseded).
    // Carried forward for stores not flipped this pass; a legacy pointer
    // without the column re-stamps them `now` — conservative, it only
    // delays their reclaim by one drain window.
    val now = System.currentTimeMillis()
    val prevAt: Map[String, Long] = {
      val p = Similarity.resolveArtifact(spark, corpusDir, "store_head")
      if (!graft.sources.Formats.pathExists(spark, p)) Map.empty
      else {
        val df = spark.read.parquet(p)
        if (!df.columns.contains("flipped_at")) Map.empty
        else df.select(col("store"), col("flipped_at"))
          .as[(String, Long)].collect().toMap
      }
    }
    Seq("docs", "decisions", "manifest")
      .map(n => (n, cur.getOrElse(n, storeGen(spark, corpusDir, n)),
        if (cur.contains(n)) now else prevAt.getOrElse(n, now)))
      .filter(_._2 > 0)
      .toDF("store", "gen", "flipped_at")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$corpusDir/store_head_compacting")
    Similarity.swapArtifact(spark, corpusDir, "store_head")
  }

  /** Reclaim superseded store generations: delete every `<name>_gen_<k>`
    * (and the legacy un-suffixed dir once a pointer exists) with
    * k < the current pointer generation. Run it where vacuum runs — after
    * the operator's in-flight-scan drain window — never inline with the
    * flip. `minAgeMs` makes the drain window ENFORCEABLE rather than
    * honor-system: a superseded dir is only deleted once the FLIP that
    * superseded it is at least that old (the flip instant is stamped
    * into the `store_head` row — the old dir itself is never touched by
    * a flip, so its own mtimes say nothing about when it stopped being
    * the head) AND the dir's own newest file is at least that old (a
    * late append that raced the flip still buys its drain window); 0
    * keeps the explicit-schedule behavior. Returns the number of
    * directories deleted. */
  def reclaimStoreGenerations(spark: SparkSession, corpusDir: String,
      minAgeMs: Long = 0L): Long = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val now = System.currentTimeMillis()
    lazy val flipAt: Map[String, Long] = {
      val p = Similarity.resolveArtifact(spark, corpusDir, "store_head")
      if (!graft.sources.Formats.pathExists(spark, p)) Map.empty
      else {
        val df = spark.read.parquet(p)
        if (df.columns.contains("flipped_at"))
          df.select(col("store"), col("flipped_at"))
            .as[(String, Long)].collect().toMap
        else {
          // legacy pointer rows carry no flip instant: the pointer
          // artifact's own newest write time IS the last flip
          val hp = new org.apache.hadoop.fs.Path(p)
          val it = fs.listFiles(hp, true)
          var newest = fs.getFileStatus(hp).getModificationTime
          while (it.hasNext)
            newest = math.max(newest, it.next().getModificationTime)
          Seq("docs", "decisions", "manifest").map(_ -> newest).toMap
        }
      }
    }
    def oldEnough(store: String, p: org.apache.hadoop.fs.Path): Boolean =
      minAgeMs <= 0L || {
        val it = fs.listFiles(p, true)
        var newest = fs.getFileStatus(p).getModificationTime
        while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
        // unknown flip instant (no head row for a store at gen > 0 cannot
        // happen, but refuse rather than guess if it does)
        now - math.max(newest, flipAt.getOrElse(store, Long.MaxValue)) >= minAgeMs
      }
    var reclaimed = 0L
    for (name <- Seq("docs", "decisions", "manifest")) {
      val cur = storeGen(spark, corpusDir, name)
      if (cur > 0) {
        val stale = new org.apache.hadoop.fs.Path(s"$corpusDir/$name") +:
          (0L until cur).map(g =>
            new org.apache.hadoop.fs.Path(s"$corpusDir/${name}_gen_$g"))
        stale.foreach { p =>
          if (fs.exists(p) && oldEnough(name, p)) {
            fs.delete(p, true); reclaimed += 1
          }
        }
      }
    }
    reclaimed
  }

  /** This lake dir's OWN epoch-stamped admitted rows — never the parent
    * chain's. Writers that rewrite the local store (vacuum, merge)
    * consume this; everything that answers "what is the corpus" goes
    * through the overlay ([[admittedRaw]]). */
  private def localAdmittedRaw(spark: SparkSession,
      corpusDir: String, collapseReplays: Boolean = true): DataFrame =
    readStore(spark, corpusDir, "docs") match {
      case None => spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text"), lit(0L).as("epoch")).limit(0)
      case Some(raw) =>
        if (collapseReplays) raw.dropDuplicates(replayKey(raw)) else raw
    }

  /** `collapseReplays = false` skips the (doc_id, epoch[, tag]) replay
    * dedup — ONLY for consumers that end in a latest-row-per-doc resolve
    * (`row_number() = 1` over doc_id): replay copies are byte-identical
    * by contract and the pair-aware committed filter already excludes
    * different-tag orphans, so the rank picks identical content whichever
    * physical copy wins — and the dedup's own exchange + sort aggregate
    * over full rows (text included) is a pure extra shuffle on every
    * snapshot serve (guide §2.4: a distinct on data the next operator
    * re-collapses anyway). Consumers where per-(doc, epoch) multiplicity
    * is observable (vacuum row accounting, the change-feed lag window)
    * keep the default. */
  private[operators] def admittedRaw(spark: SparkSession,
      corpusDir: String, collapseReplays: Boolean = true): DataFrame =
    parentOf(spark, corpusDir) match {
      case None => localAdmittedRaw(spark, corpusDir, collapseReplays)
      case Some((parent, base, _)) =>
        // branch overlay: the parent's history is visible only up to the
        // branch point — rows past it (including epochs the parent
        // committed AFTER the branch) never enter this lake's reads, so
        // branch-local epoch numbers can never collide into visibility
        localAdmittedRaw(spark, corpusDir, collapseReplays).unionByName(
          admittedRaw(spark, parent, collapseReplays)
            .filter(col("epoch") <= base),
          allowMissingColumns = true)
    }

  /** Committed manifest rows (replay copies collapsed per epoch).
    * mergeSchema: the manifest schema EVOLVED in place — lakes written
    * before the version/batch-id split lack `batch_id`/`n_deleted`
    * ([[deleteDocs]]) and serve nulls there; readers that consume those
    * columns guard on presence. Resolves the generation pointer: after a
    * [[compactManifest]] the history serves from `manifest_gen_<k>`. */
  def manifest(spark: SparkSession, corpusDir: String): DataFrame = {
    val local = localManifest(spark, corpusDir)
    parentOf(spark, corpusDir) match {
      case None => local
      case Some((parent, base, _)) =>
        // branch overlay: parent commits up to the branch point are part
        // of this lake's history; later parent commits are not
        local.unionByName(
          manifest(spark, parent).filter(col("version") <= base),
          allowMissingColumns = true)
          .dropDuplicates("version")
    }
  }

  private def localManifest(spark: SparkSession,
      corpusDir: String): DataFrame = {
    val p = manifestTarget(spark, corpusDir)
    if (!graft.sources.Formats.pathExists(spark, p))
      return spark.range(0).select(col("id").as("version"),
        lit(0L).as("n_arrived"), lit(0L).as("n_admitted"),
        lit(0L).as("n_duplicate"), lit(0L).as("n_contaminated"),
        lit(0L).as("n_low_quality")).limit(0)
    // listing-signature memo of the ANALYZED read (plan + inferred
    // schema): a mergeSchema read runs a footer-union Spark job per call,
    // and a serve resolves the manifest several times (committed filter,
    // head resolve, floor checks). The handle is an unpersisted plan —
    // execution still scans parquet; a new commit (new manifest file)
    // changes the signature and re-reads.
    graft.sources.Caches.bySignature[DataFrame](spark, "manifest_df", p) {
      spark.read.option("mergeSchema", "true").parquet(p)
        .dropDuplicates("version")
    }
  }

  /** The manifest's live directory — generation-pointer resolved, so both
    * readers and the commit writers agree on where the history lives
    * after a [[compactManifest]] flip. */
  private def manifestTarget(spark: SparkSession, corpusDir: String): String =
    Similarity.resolveArtifact(spark, corpusDir,
      storeName(spark, corpusDir, "manifest"))

  /** Compact the manifest's one-file-per-commit history — the Delta-
    * checkpoint analogue. Every commit appends ONE small parquet file, so
    * after k commits each `manifest()` read (and therefore every lake
    * read's committed-epoch semi-join) pays a k-file listing + footer
    * union; at a minute-cadence year that is ~500k files of pure metadata
    * overhead. This pass rewrites the deduped history into O(rows/target)
    * files (normally ONE) in a NEW `manifest_gen_<k+1>` dir and flips the
    * `store_head` pointer — the same no-retry convention as
    * [[optimizeCorpusVersioned]]: in-flight readers keep their planned
    * generation, commits follow the pointer, superseded dirs are
    * reclaimed by [[reclaimStoreGenerations]] after the drain window.
    * Rows are version-range-packed and sorted so a pinned time-travel
    * read still prunes by parquet min/max. Crash before the flip leaves
    * an orphan gen dir the next attempt overwrites; the audit history is
    * never dropped — this is a physical rewrite only ([[vacuumCorpus]]
    * deliberately keeps every manifest row). Single-writer discipline
    * like every rewrite: run from the maintenance cadence (a commit
    * landing mid-compaction would land in the OLD generation and vanish
    * at the flip). Returns (files before, files after). */
  def compactManifest(spark: SparkSession, corpusDir: String,
      targetRowsPerFile: Long = 1L << 20): (Long, Long) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val p = manifestTarget(spark, corpusDir)
    if (!graft.sources.Formats.pathExists(spark, p)) return (0L, 0L)
    val before = dataFileCount(spark, p)
    val nextGen = storeGen(spark, corpusDir, "manifest") + 1
    val rows = spark.read.option("mergeSchema", "true").parquet(p)
      .dropDuplicates("version")
    val n = rows.count()
    val nFiles = math.max(1L,
      (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    rows.repartitionByRange(nFiles, col("version"))
      .sortWithinPartitions(col("version"))
      .write.mode("overwrite").parquet(s"$corpusDir/manifest_gen_$nextGen")
    val after = dataFileCount(spark, s"$corpusDir/manifest_gen_$nextGen")
    flipStoreHead(spark, corpusDir, Seq("manifest" -> nextGen))
    (before, after)
  }

  /** Allocate the next lake version: one past everything the manifest has
    * committed AND everything any store has epoch-stamped. The second leg
    * steps over crash orphans — a crashed commit attempt's manifest-less
    * rows keep their epoch, and re-using it (by a replayed batch or a
    * [[deleteDocs]]) would make the dead rows committed-visible the moment
    * the new manifest row lands. Versions are therefore strictly monotone
    * but not dense (orphaned numbers are burned; [[vacuumCorpus]] reclaims
    * the rows). Cost: one manifest max plus one parquet-footer max per
    * store — metadata-cheap, no data scan. */
  private[graft] def nextLakeVersion(spark: SparkSession,
      corpusDir: String): Long = {
    import spark.implicits._
    val head = manifest(spark, corpusDir).agg(max(col("version")))
      .as[Option[Long]].head().getOrElse(-1L)
    val storeMax = Seq("docs", "decisions").flatMap { name =>
      readStore(spark, corpusDir, name).flatMap { df =>
        if (!df.columns.contains("epoch")) None
        else df.agg(max(col("epoch"))).as[Option[Long]].head()
      }
    }.foldLeft(-1L)(math.max)
    math.max(head, storeMax) + 1L
  }

  /** Delete documents from the lake — the retraction path (takedown /
    * right-to-be-forgotten). A delete is NOT an arriving document: it is
    * admission-exempt and commits as its own epoch of tombstone rows
    * (doc_id, text = null, `_deleted` = true) through the same
    * data-first/manifest-last protocol as ingest, so a crash leaves an
    * invisible partial epoch and a re-run commits cleanly at a fresh
    * version.
    *
    * Semantics, all LWW by committed epoch:
    *  - [[readCorpusAt]] at or past the delete version hides the doc AND
    *    shadows its base-corpus row; versions pinned BEFORE the delete
    *    (and pinned runs) still serve it — a delete is part of history,
    *    not an edit of it. The bytes are gone only when [[vacuumCorpus]]
    *    raises the floor past the superseded text rows (hide now, purge
    *    at vacuum — the table-format contract).
    *  - [[readCorpusChanges]] emits `change_type = "delete"` for docs
    *    whose latest in-window row is a tombstone (when the doc was
    *    visible at the cursor), so every lake-fed index refresher
    *    retracts it.
    *  - Admission: a tombstoned doc no longer blocks near-dups — the
    *    exact verify resolves the candidate's text latest-wins and a
    *    tombstone has none (its stale bucket rows generate candidates
    *    that fail the verify, the documented inert-garbage trade).
    *  - A later re-upload of the id through the ingest stream wins over
    *    the tombstone (higher epoch) — deletes are reversible by
    *    re-admission.
    *
    * Deleting an id the lake never saw writes an inert tombstone (it
    * hides nothing until that id exists); deleting an already-deleted id
    * is idempotent. Like every non-stream writer here, run from the
    * maintenance cadence or with ingest quiesced (single-writer
    * discipline). Returns the committed delete version. */
  def deleteDocs(spark: SparkSession, corpusDir: String,
      ids: DataFrame): Long = {
    import spark.implicits._
    require(ids.columns.contains("doc_id"),
      s"deleteDocs needs a doc_id column, got ${ids.columns.mkString(", ")}")
    requireNotFollower(spark, corpusDir, "deleteDocs")
    val victims = ids.select(col("doc_id")).distinct().localCheckpoint()
    val n = victims.count()
    require(n > 0, "deleteDocs: empty id set (nothing to delete)")
    // version allocation + both writes run under the writer lease: a
    // concurrent writer would race nextLakeVersion into a double-assigned
    // epoch — the exact corruption the lease exists to refuse
    withOpLease(spark, corpusDir, "deleteDocs") { (recheck, tag) =>
      val v = nextLakeVersion(spark, corpusDir)
      victims.select(col("doc_id"),
          lit(null).cast("string").as("text"),
          lit(v).as("epoch"),
          lit(true).as("_deleted"),
          lit(tag).as("_commit"))
        .write.mode("append").parquet(liveTarget(spark, corpusDir, "docs"))
      recheck()
      // the manifest row commits the tombstone epoch — LAST. batch_id = -1:
      // the replay guard's pre-split fallback is coalesce(batch_id, version),
      // so a NULL here would let a future stream batch id collide with this
      // version and skip real data; -1 is outside the batch-id space (≥ 0)
      // and never matches.
      Seq((v, 0L, 0L, 0L, 0L, 0L, -1L, n))
        .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
          "n_contaminated", "n_low_quality", "batch_id", "n_deleted")
        .withColumn("committed_at", lit(System.currentTimeMillis()))
        .withColumn("commit_tag", lit(tag))
        .write.mode("append").parquet(manifestTarget(spark, corpusDir))
      v
    }
  }

  /** Timestamp time travel — resolve a wall-clock instant to the newest
    * version whose commit landed at or before it, then serve that
    * snapshot (the TIMESTAMP AS OF convention). Commit instants are the
    * manifest's `committed_at` column (epoch millis, recorded at the
    * manifest write — the commit point); the column arrived by schema
    * evolution, so commits written before it carry nulls and resolve as
    * arbitrarily old — they demonstrably predate any instant a caller
    * can name. Replay copies of an epoch may carry different instants;
    * the manifest read collapses per version (the first-written row
    * wins a tie arbitrarily, which only shifts the boundary WITHIN the
    * replay window of one commit — both instants are honest commit
    * times for it). Refuses an instant older than the first commit, and
    * the resolved version still honors the vacuum retention floor like
    * any pinned read. */
  def readCorpusAsOf(spark: SparkSession, dir: String, corpusDir: String,
      tsMillis: Long): DataFrame =
    readCorpusAt(spark, dir, corpusDir,
      Some(versionAsOf(spark, corpusDir, tsMillis)))

  /** The newest committed version at or before the instant (the resolve
    * half of [[readCorpusAsOf]]); refuses an instant older than the
    * first commit. */
  def versionAsOf(spark: SparkSession, corpusDir: String,
      tsMillis: Long): Long = {
    import spark.implicits._
    val man = manifest(spark, corpusDir)
    val at = if (man.columns.contains("committed_at"))
      coalesce(col("committed_at"), lit(Long.MinValue))
    else lit(Long.MinValue)
    man.filter(at <= tsMillis).agg(max($"version"))
      .as[Option[Long]].head()
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at or before $tsMillis — the lake's first commit is newer"))
  }

  /** Age-based retention — "keep the last N days": raise the vacuum
    * floor to the newest version committed at or before the cutoff
    * instant (the caller computes cutoff = now − horizon). A pure
    * composition of [[versionAsOf]] with [[vacuumCorpus]], so every
    * floor rule still holds: floors only rise, pinned runs refuse the
    * raise (governance beats reclamation), pre-floor pins and change
    * windows throw afterward. Refuses when no commit is old enough —
    * an empty collection must not look like one that ran. Returns the
    * resolved floor version. */
  def vacuumCorpusOlderThan(spark: SparkSession, corpusDir: String,
      cutoffMillis: Long, versioned: Boolean = false): Long = {
    val v = versionAsOf(spark, corpusDir, cutoffMillis)
    vacuumCorpus(spark, corpusDir, v, versioned)
    v
  }

  /** Committed (epoch, writer-tag) pairs from a manifest frame. Pre-tag
    * manifest rows (no `commit_tag` column, or nulls from the schema
    * evolution) yield a null tag, which the pair filter treats as
    * "admit by epoch alone" — the legacy compatibility path. */
  private def committedPairs(man: DataFrame): DataFrame = {
    val tag =
      if (man.columns.contains("commit_tag")) col("commit_tag")
      else lit(null).cast("string")
    man.select(col("version").as("epoch"), tag.as("_man_tag"))
  }

  /** PAIR-AWARE committed filter — the read-side half of the
    * manifest-last protocol, hardened against orphan ADOPTION: a row is
    * committed iff its epoch has a manifest row AND, when both sides are
    * tagged, the row's `_commit` writer tag matches the manifest row's
    * `commit_tag`. A zombie writer that appended data at version v after
    * its lease takeover, and a new holder that committed the SAME v,
    * carry DIFFERENT tags — the epoch-only semi-join would adopt the
    * zombie's rows into the new holder's commit; the pair test excludes
    * them (and [[vacuumCorpus]] reclaims them by the same test). Either
    * side null ⇒ epoch-only (pre-tag lakes keep serving). The join stays
    * an equi-join on epoch (manifest-sized build side) with the tag test
    * as a residual filter. `keepTag = true` preserves the `_commit`
    * column for store rewrites; readers get it stripped. */
  private[operators] def committedRows(rows: DataFrame, man: DataFrame,
      keepTag: Boolean = false): DataFrame = {
    val hasTag = rows.columns.contains("_commit")
    val r = rows.alias("r")
    val m = committedPairs(man).alias("m")
    val rowTag = if (hasTag) col("r._commit") else lit(null).cast("string")
    val joined = r.join(m,
      col("r.epoch") === col("m.epoch") &&
        (rowTag.isNull || col("m._man_tag").isNull ||
          rowTag === col("m._man_tag")),
      "left_semi")
    if (hasTag && !keepTag) joined.drop("_commit") else joined
  }

  /** The anti half of [[committedRows]] — rows NO committed (epoch, tag)
    * pair admits: crash orphans and taken-over writers' appends, the set
    * vacuum's orphan cleanup reclaims. */
  private def uncommittedRows(rows: DataFrame, man: DataFrame): DataFrame = {
    val hasTag = rows.columns.contains("_commit")
    val r = rows.alias("r")
    val m = committedPairs(man).alias("m")
    val rowTag = if (hasTag) col("r._commit") else lit(null).cast("string")
    r.join(m,
      col("r.epoch") === col("m.epoch") &&
        (rowTag.isNull || col("m._man_tag").isNull ||
          rowTag === col("m._man_tag")),
      "left_anti")
  }

  /** The store's replay-collapse key: (doc_id, epoch) plus the `_commit`
    * writer tag when present. Two DIFFERENT writers' rows at one
    * (doc_id, epoch) — the orphan-adoption race — must NOT collapse into
    * an arbitrary survivor BEFORE the pair-aware committed filter can
    * exclude the orphan; same-writer replay copies still collapse
    * (a stable owner replays under an identical tag). */
  private[operators] def replayKey(df: DataFrame): Seq[String] =
    if (df.columns.contains("_commit")) Seq("doc_id", "epoch", "_commit")
    else Seq("doc_id", "epoch")

  /** Semi-join a (…, epoch) relation down to manifest-committed epochs ≤ the
    * pinned version — the read-side half of the manifest-last protocol,
    * pair-aware via [[committedRows]]. */
  private def committedOnly(rows: DataFrame, man: DataFrame,
      version: Option[Long]): DataFrame =
    committedRows(rows, version.fold(man)(v => man.filter(col("version") <= v)))

  /** The lake's committed admitted docs at a pinned version (all committed
    * when None), doc-level latest-epoch-wins, INCLUDING tombstone rows
    * ([[deleteDocs]]) — the `_deleted` flag is normalized to a non-null
    * boolean so every caller can branch on it (a never-deleted-from lake
    * has no `_deleted` column at all). Callers that serve documents must
    * filter `!_deleted` AFTER using the full id set for shadowing
    * ([[readCorpusAt]]): a tombstone both hides the doc AND shadows any
    * base row under the same id. A version below the [[retentionFloor]]
    * is REFUSED loudly — [[vacuumCorpus]] collapsed that history, and
    * serving a silently-wrong snapshot is the one failure a versioned
    * lake must never have. */
  private[graft] def admittedAt(spark: SparkSession, corpusDir: String,
      version: Option[Long]): DataFrame = {
    version.foreach { v =>
      val floor = retentionFloor(spark, corpusDir)
      require(v >= floor,
        s"version $v predates the retention floor $floor: vacuumCorpus " +
          "collapsed that history (pin a version >= the floor)")
    }
    // collapseReplays = false: the latest-row resolve below collapses
    // replay copies itself (see admittedRaw) — one fewer full-row shuffle
    // per snapshot serve
    resolveLatestAdmitted(committedOnly(
      admittedRaw(spark, corpusDir, collapseReplays = false),
      manifest(spark, corpusDir), version))
  }

  /** Doc-level latest-epoch-wins over committed admitted rows, `_deleted`
    * normalized to a non-null boolean — the resolve half shared by the
    * full read ([[admittedAt]]) and the stats-pruned one
    * ([[readCorpusAtRange]]): both feed it rows that are complete for
    * every doc_id they contain, which is all LWW needs. */
  private def resolveLatestAdmitted(rows: DataFrame): DataFrame = {
    val resolved = rows.withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    if (resolved.columns.contains("_deleted"))
      resolved.withColumn("_deleted", coalesce(col("_deleted"), lit(false)))
    else resolved.withColumn("_deleted", lit(false))
  }

  /** The ids whose CURRENT committed state is a tombstone ([[deleteDocs]]
    * or a stream takedown) — the retraction set index GC passes consume.
    * Tombstone-count-sized, never corpus-sized: only ids that have SOME
    * tombstone row are resolved latest-wins (an id re-admitted past its
    * tombstone drops back out). */
  private[graft] def deletedIds(spark: SparkSession,
      corpusDir: String): DataFrame = {
    val committed = committedOnly(
      admittedRaw(spark, corpusDir, collapseReplays = false),
      manifest(spark, corpusDir), None)
    if (!committed.columns.contains("_deleted"))
      return spark.range(0).select(col("id").as("doc_id")).limit(0)
    val flagged = committed
      .filter(coalesce(col("_deleted"), lit(false)))
      .select(col("doc_id")).distinct()
    committed.join(flagged, Seq("doc_id"), "left_semi")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch").desc)))
      .filter(col("_rn") === 1)
      .filter(coalesce(col("_deleted"), lit(false)))
      .select(col("doc_id"))
  }

  /** Time-travel read of the corpus: base corpus ∪ admitted docs with
    * committed epoch ≤ `version` (latest state when None). Latest epoch
    * wins per doc_id, and an admitted re-upload of a BASE doc_id shadows
    * the base row (LWW all the way down). Uncommitted partial epochs are
    * invisible by the manifest semi-join. Schema-evolved lakes serve
    * every stored column: extra metadata columns a later epoch introduced
    * appear with nulls for base docs and pre-evolution epochs (schema is
    * table-level, not per-version — the table-format convention). */
  def readCorpusAt(spark: SparkSession, dir: String, corpusDir: String,
      version: Option[Long] = None): DataFrame =
    serveSnapshot(
      Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")),
      admittedAt(spark, corpusDir, version))

  /** The serve half of a snapshot read: base rows not shadowed by ANY
    * resolved lake row (the anti-join runs on the FULL resolved id set —
    * a tombstone ([[deleteDocs]]) must hide its base doc, not just lake
    * versions) unioned with the non-deleted lake winners.
    *
    * The resolved overlay is referenced TWICE (the id-pruned anti-join
    * leg and the full-row union leg) and therefore EXECUTES twice — the
    * documented trade (r18 "Not yet optimized"): the anti leg is
    * column-pruned to doc_id, so the second execution is a cheap columnar
    * re-scan, while materializing the overlay would hold full rows (text
    * included) in executor storage per serve. MEASURED at the r19 1M-doc
    * scale point (SCALING.md "Round-19", two runs per arm, cal 1.00):
    * the lazy-checkpoint form lost net — serve-head totals 8.0/8.8 s
    * (re-scan) vs 10.0/11.0 s (checkpoint); plain snapshot heads
    * (corpus_delete/replica) gained ~10 % but corpus_optimize, whose
    * rewrite consumes the snapshot once, paid the full-row
    * materialization for nothing (2.3/2.6 s → 4.7/4.7 s). The re-scan
    * stays the default; `SPARK_GRAFT_SNAPSHOT_CKPT=1` keeps the A/B
    * reproducible (lazy, so analysis-only reads stay jobless). */
  private def serveSnapshot(base: DataFrame, admitted0: DataFrame): DataFrame = {
    val admitted =
      if (sys.env.get("SPARK_GRAFT_SNAPSHOT_CKPT").contains("1"))
        admitted0.localCheckpoint(false) // lazy: analysis-only reads stay jobless
      else admitted0
    base.join(admitted.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(
        admitted.filter(!col("_deleted")).drop("epoch", "_deleted"),
        allowMissingColumns = true)
  }

  // ----------------- data skipping (zone-map file stats + pruned reads)

  /** Collect per-file zone maps over the docs store — the Delta-style
    * data-skipping statistics the lake's point/range reads prune with:
    * one row per data file carrying (row count, min/max doc_id, min/max
    * epoch). ONE column-pruned scan (two long columns + the virtual
    * `input_file_name`, never text) aggregated per file, written through
    * the `_compacting` swap as a file-count-sized artifact. Run it where
    * the OPTIMIZE passes run — after a pack, when files are range-laid
    * by (epoch, doc_id), the zones are tight and a doc_id range touches
    * O(range/target-file-rows) files. Staleness is SAFE by construction:
    * [[prunedDocsFiles]] includes any live file with no stats row
    * (post-collect appends), and stats rows for files a rewrite removed
    * simply match nothing — pruning degrades toward the full listing,
    * never past correctness. Returns the number of files profiled. */
  def collectFileStats(spark: SparkSession, corpusDir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$corpusDir/file_stats"), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$corpusDir/file_stats_compacting"), true)
    collectFileStatsIncremental(spark, corpusDir)._2
  }

  /** Incremental zone-map maintenance — O(files ADDED since the last
    * collect), never O(lake): scan only live files without a stats row,
    * keep rows of still-live files, drop rows whose file a rewrite
    * removed. All bookkeeping is driver-side on file-count-sized sets
    * (the same metadata class as scan planning); the only cluster work
    * is the two-column scan of the fresh files. [[maintainCorpusStream]]
    * fires this at its optimize cadence, right after the live-window
    * pack — each firing profiles just the freshly packed segment, so
    * zones track the layout with no standalone scheduler and the
    * per-firing cost stays O(window). A no-op when nothing changed (no
    * artifact churn). Returns (files newly profiled, live files total). */
  def collectFileStatsIncremental(spark: SparkSession,
      corpusDir: String): (Long, Long) = {
    import spark.implicits._
    val live = docsDataFiles(spark, corpusDir)
    val liveSet = live.toSet
    val sp = Similarity.resolveArtifact(spark, corpusDir, "file_stats")
    val oldRows: Seq[(String, Long, Long, Long, Long, Long)] =
      if (!graft.sources.Formats.pathExists(spark, sp)) Nil
      // listing-signature memo: the stats artifact is re-collected on
      // every freshness check; it only changes when this pass rewrites it
      else graft.sources.Caches.bySignature[
          Seq[(String, Long, Long, Long, Long, Long)]](
          spark, "file_stats", sp) {
        spark.read.parquet(sp)
          .select($"file", $"n_rows", $"min_doc_id", $"max_doc_id",
            $"min_epoch", $"max_epoch")
          .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      }
    val keep = oldRows.filter(r => liveSet(normPath(r._1)))
    val known = keep.map(r => normPath(r._1)).toSet
    val fresh = live.filterNot(known)
    if (fresh.isEmpty && keep.size == oldRows.size)
      return (0L, live.size.toLong)
    val dataRows: Seq[(String, Long, Long, Long, Long, Long)] =
      if (fresh.isEmpty) Nil
      else spark.read.option("mergeSchema", "true").parquet(fresh: _*)
        .select(input_file_name().as("file"), col("doc_id"), col("epoch"))
        .groupBy($"file")
        .agg(count(lit(1)).as("n_rows"),
          min($"doc_id").as("min_doc_id"), max($"doc_id").as("max_doc_id"),
          min($"epoch").as("min_epoch"), max($"epoch").as("max_epoch"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // a 0-row file (the live store's truncation remainder) produces no
    // aggregate row; give it a DEGENERATE zone (min > max) so it matches
    // no range — otherwise it stays "fresh" forever and every pruned
    // read conservatively opens it
    val covered = dataRows.map(r => normPath(r._1)).toSet
    val emptyRows = fresh.filterNot(covered).map(f =>
      (f, 0L, Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue))
    (keep ++ dataRows ++ emptyRows)
      .toDF("file", "n_rows", "min_doc_id", "max_doc_id",
        "min_epoch", "max_epoch")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$corpusDir/file_stats_compacting")
    Similarity.swapArtifact(spark, corpusDir, "file_stats")
    (fresh.size.toLong, live.size.toLong)
  }

  /** Scheme-independent path normalization so the Hadoop listing and
    * `input_file_name()` (a percent-encoded URI) agree on a key — applied
    * driver-side to both, on file-count-sized sets. Within one lake
    * directory the authority is constant, so the URI path alone is a
    * unique key. */
  private def normPath(s: String): String =
    new org.apache.hadoop.fs.Path(
      java.net.URLDecoder.decode(s, "UTF-8")).toUri.getPath

  /** The docs store's live data files (normalized paths), listed the way
    * Spark's own file index would: recursive, skipping `_`/`.`-prefixed
    * names. File-count-sized driver work — the same cost class as the
    * scan planning it replaces. */
  private def docsDataFiles(spark: SparkSession,
      corpusDir: String): Seq[String] = {
    val p = Similarity.resolveArtifact(spark, corpusDir,
      storeName(spark, corpusDir, "docs"))
    if (!graft.sources.Formats.pathExists(spark, p)) return Nil
    val root = new org.apache.hadoop.fs.Path(p)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(d).toSeq.filterNot(s => hidden(s.getPath.getName))
        .flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s.getPath))
    walk(root).map(pt => normPath(pt.toUri.toString))
  }

  /** Resolve the candidate file set for a doc_id range read at a pinned
    * version: zones overlapping [idLo, idHi] whose min_epoch could be
    * committed-visible, plus — conservatively — every live file without
    * a stats row. Returns (candidates, total live files). No stats store
    * at all → the full listing (pruning is an optimization, never a
    * correctness dependency). */
  private def prunedDocsFiles(spark: SparkSession, corpusDir: String,
      idLo: Long, idHi: Long,
      version: Option[Long]): (Seq[String], Long) =
    prunedDocsFilesRuns(spark, corpusDir, Seq(idLo -> idHi), version)

  /** The run-list generalization: a file is a candidate when its zone
    * overlaps ANY of the requested id runs (sorted, disjoint). O(files ·
    * runs) driver-side interval tests over file-count-sized metadata. */
  private def prunedDocsFilesRuns(spark: SparkSession, corpusDir: String,
      runs: Seq[(Long, Long)],
      version: Option[Long]): (Seq[String], Long) = {
    import spark.implicits._
    val live = docsDataFiles(spark, corpusDir)
    val sp = Similarity.resolveArtifact(spark, corpusDir, "file_stats")
    if (!graft.sources.Formats.pathExists(spark, sp))
      return (live, live.size.toLong)
    val zones = spark.read.parquet(sp)
      .select($"file", $"min_doc_id", $"max_doc_id", $"min_epoch")
      .as[(String, Long, Long, Long)].collect()
      .map(z => normPath(z._1) -> z).toMap
    val cand = live.filter { f =>
      zones.get(f) match {
        case None => true // post-collect append: no zone, always read
        case Some((_, mn, mx, mnEp)) =>
          version.forall(mnEp <= _) &&
            runs.exists { case (lo, hi) => mx >= lo && mn <= hi }
      }
    }
    (cand, live.size.toLong)
  }

  /** Stats-pruned range read — [[readCorpusAt]] restricted to
    * doc_id ∈ [idLo, idHi], resolving which data files to OPEN from the
    * [[collectFileStats]] zone maps instead of scanning the whole store.
    * Row-identical to `readCorpusAt(...).filter(doc_id between)` because
    * LWW is per-doc and every file that can hold ANY row of an in-range
    * doc overlaps the range by definition of its zone, so the winner
    * resolution sees the complete history of every served id (tombstones
    * included — they live in the same store). At 100 TB this is the
    * difference between a point lookup opening every footer of a
    * million-file store and opening the handful whose zones overlap —
    * after an OPTIMIZE pack the store is (epoch, doc_id)-range-laid, so
    * zones are tight. Parquet row-group min/max skipping still applies
    * INSIDE each opened file via the pushed range filter. */
  def readCorpusAtRange(spark: SparkSession, dir: String, corpusDir: String,
      idLo: Long, idHi: Long, version: Option[Long] = None): DataFrame = {
    require(idLo <= idHi, s"empty id range [$idLo, $idHi]")
    version.foreach { v =>
      val floor = retentionFloor(spark, corpusDir)
      require(v >= floor,
        s"version $v predates the retention floor $floor: vacuumCorpus " +
          "collapsed that history (pin a version >= the floor)")
    }
    val inRange = col("doc_id").between(idLo, idHi)
    val admitted = resolveLatestAdmitted(
      committedOnly(prunedRawChain(spark, corpusDir, idLo, idHi, version),
        manifest(spark, corpusDir), version))
    serveSnapshot(
      Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")).filter(inRange),
      admitted)
  }

  /** The zone-pruned raw rows of the whole parent chain for a doc_id
    * range: this dir's pruned files plus — when this is a branch — the
    * parent's, capped at the branch point (the overlay contract of
    * [[admittedRaw]], pruned). */
  private def prunedRawChain(spark: SparkSession, corpusDir: String,
      idLo: Long, idHi: Long, version: Option[Long]): DataFrame =
    prunedRawChainRuns(spark, corpusDir, Seq(idLo -> idHi),
      col("doc_id").between(idLo, idHi), version)

  /** Run-list chain read: ONE scan per chain level over the union of
    * candidate files, the id predicate pushed into it. */
  private def prunedRawChainRuns(spark: SparkSession, corpusDir: String,
      runs: Seq[(Long, Long)], idPred: org.apache.spark.sql.Column,
      version: Option[Long]): DataFrame = {
    val (files, _) = prunedDocsFilesRuns(spark, corpusDir, runs, version)
    val local =
      if (files.isEmpty)
        spark.range(0).select(col("id").as("doc_id"),
          lit("").as("text"), lit(0L).as("epoch")).limit(0)
      else
        // no replay collapse: both consumers (range read, id-set lookup)
        // end in resolveLatestAdmitted — same argument as admittedRaw's
        // collapseReplays = false path
        spark.read.option("mergeSchema", "true")
          .parquet(files: _*).filter(idPred)
    parentOf(spark, corpusDir) match {
      case None => local
      case Some((parent, base, _)) =>
        local.unionByName(
          prunedRawChainRuns(spark, parent, runs, idPred,
            Some(version.fold(base)(math.min(_, base))))
            .filter(col("epoch") <= base),
          allowMissingColumns = true)
    }
  }

  /** Point lookups for a SCATTERED id set through the zone maps: the
    * candidate files are those whose zone overlaps ANY requested id (one
    * driver-side interval test per (file, id-run) over file-count-sized
    * metadata — ids are coalesced into runs first), then the standard
    * committed/LWW/tombstone resolve runs over just those files with the
    * id-set filter pushed to the scans. Row-identical to
    * `readCorpusAt(...).filter(doc_id isin ids)` by the same per-doc LWW
    * argument as the range read. The id list is a driver literal — this
    * is the serving-lookup API (a handful to a few thousand ids), not a
    * join; for relation-sized id sets use `readCorpusAt` + a semi-join. */
  def readCorpusForIds(spark: SparkSession, dir: String, corpusDir: String,
      ids: Seq[Long], version: Option[Long] = None): DataFrame = {
    require(ids.nonEmpty, "empty id set")
    require(ids.size <= 100000,
      s"${ids.size} ids: the id-list lookup is for serving-sized sets — " +
        "use readCorpusAt with a semi-join for relation-sized sets")
    version.foreach { v =>
      val floor = retentionFloor(spark, corpusDir)
      require(v >= floor,
        s"version $v predates the retention floor $floor: vacuumCorpus " +
          "collapsed that history (pin a version >= the floor)")
    }
    // coalesce sorted ids into contiguous runs so the zone test is
    // O(files · runs), and the per-file union of runs stays small
    val sorted = ids.distinct.sorted
    val runs = sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, id) if id == hi + 1 => (lo, id) :: tail
      case (acc, id) => (id, id) :: acc
    }.reverse
    val inSet = col("doc_id").isin(sorted: _*)
    val raw = prunedRawChainRuns(spark, corpusDir, runs, inSet, version)
    val admitted = resolveLatestAdmitted(
      committedOnly(raw, manifest(spark, corpusDir), version))
    serveSnapshot(
      Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")).filter(inSet),
      admitted)
  }

  /** Observability twin of the prune decision: (files a range read would
    * open, total live files) — what the SCALING probe and the spec pin. */
  def pruningStats(spark: SparkSession, corpusDir: String, idLo: Long,
      idHi: Long, version: Option[Long] = None): (Long, Long) = {
    val (cand, total) = prunedDocsFiles(spark, corpusDir, idLo, idHi, version)
    parentOf(spark, corpusDir) match {
      case None => (cand.size.toLong, total)
      case Some((parent, base, _)) =>
        val (pc, pt) = pruningStats(spark, parent, idLo, idHi,
          Some(version.fold(base)(math.min(_, base))))
        (cand.size.toLong + pc, total + pt)
    }
  }

  // ----------------- branches (zero-copy experiment clones of the lake)

  /** The branch parent pointer, when this lake dir is a branch:
    * (parent dir, base version, branch name). One KB-scale artifact. */
  private[graft] def parentOf(spark: SparkSession,
      corpusDir: String): Option[(String, Long, String)] = {
    val p = Similarity.resolveArtifact(spark, corpusDir, "branch_parent")
    if (!graft.sources.Formats.pathExists(spark, p)) None
    else {
      import spark.implicits._
      // listing-signature memo: the pointer is KB-scale and read on every
      // overlay resolve (twice per branch serve) — the parquet read + head
      // are two driver round-trip Spark jobs each time (guide §5); any
      // on-disk change to the artifact re-reads it
      graft.sources.Caches.bySignature[(String, Long, String)](
        spark, "branch_parent", p) {
        spark.read.parquet(p)
          .select(col("parent"), col("base_version"), col("name"))
          .as[(String, Long, String)].head()
      } match { case t => Some(t) }
    }
  }

  /** Create a zero-copy branch of the lake — the shallow-clone /
    * experiment-branch convention: `branchDir` becomes a lake of its own
    * whose history is the parent's committed history up to the branch
    * point (the parent head) OVERLAID by whatever the branch commits.
    * Nothing is copied: the only write is the KB-scale `branch_parent`
    * pointer, plus a pinned run `branch_<name>` on the PARENT at the
    * branch point so [[vacuumCorpus]] refuses to collapse the shared
    * history while the branch lives (drop the branch to release it).
    *
    * Every lake operation works on the branch unchanged — ingest
    * ([[maintainCorpusStream]] with branch-scoped index dirs), deletes,
    * time travel, CDC, OPTIMIZE of the branch's own appends, pinned
    * runs — because every read resolves through the parent-aware
    * [[manifest]]/[[admittedRaw]] overlay. Parent commits AFTER the
    * branch point are invisible to the branch (snapshot isolation), and
    * branch commits are invisible to the parent until [[mergeBranch]].
    * Branch-local epochs allocate past the branch point
    * ([[nextLakeVersion]] sees the overlay head ≥ base), and parent rows
    * past the base are filtered out of every branch read, so epoch
    * numbering cannot collide into visibility. Branches nest (a branch
    * of a branch chains the overlay). This is the corpus-ablation loop:
    * branch → mutate → evaluate → merge or drop, at zero storage cost
    * for the unchanged 100 TB. Returns the base version. */
  def createBranch(spark: SparkSession, dir: String, parentDir: String,
      branchDir: String, name: String): Long = {
    import spark.implicits._
    require(name.nonEmpty && name.matches("[A-Za-z0-9_\\-]+"),
      s"branch name must be [A-Za-z0-9_-]+, got '$name'")
    require(!graft.sources.Formats.pathExists(
        spark, s"$branchDir/branch_parent") &&
      !graft.sources.Formats.pathExists(spark, s"$branchDir/docs") &&
      !graft.sources.Formats.pathExists(spark, s"$branchDir/manifest"),
      s"$branchDir already holds a lake or branch")
    val base = pinRun(spark, dir, parentDir, s"branch_$name")
    Seq((parentDir, base, name))
      .toDF("parent", "base_version", "name")
      .coalesce(1).write.mode("errorifexists")
      .parquet(s"$branchDir/branch_parent")
    base
  }

  /** Fold a branch back into its parent as ONE committed parent epoch:
    * the branch's net effect — each touched doc's branch-latest state,
    * tombstones included — lands through the standard data-first/
    * manifest-last protocol, so the merge is crash-safe and atomic like
    * any commit. Merge-wins semantics (the LWW the whole lake speaks):
    * the merge epoch is newer than anything the parent committed while
    * the branch lived, so for every doc the branch touched, the branch's
    * view wins; docs it never touched keep the parent's state. Cost is
    * O(branch-local rows) — the parent's data is never read or
    * rewritten. Pass the PARENT's maintenance dir to keep its dedup
    * index whole: the merged live docs' bucket rows land at the merge
    * epoch, so post-merge admission on the parent flags near-dups of
    * merged content. The branch survives the merge (serving its own
    * history) until [[dropBranch]]. Returns the parent version committed, or -1
    * when the branch committed nothing (nothing to merge). */
  def mergeBranch(spark: SparkSession, branchDir: String,
      maintDir: Option[String] = None): Long = {
    val (parent, base, _) = parentOf(spark, branchDir).getOrElse(
      throw new IllegalArgumentException(
        s"$branchDir is not a branch (no branch_parent pointer)"))
    commitNetEffect(spark, branchNetEffect(spark, branchDir, base), parent,
      maintDir)
  }

  /** The branch's net effect: each touched doc's branch-latest committed
    * state, tombstones included — LWW over the branch's OWN rows (all
    * past the base by allocation). O(branch rows). */
  private def branchNetEffect(spark: SparkSession, branchDir: String,
      base: Long): DataFrame =
    resolveLatestAdmitted(committedOnly(
      localAdmittedRaw(spark, branchDir),
      manifest(spark, branchDir), None))
      .filter(col("epoch") > base)

  /** Refuse a LOCAL write into a replication follower. A lake holding a
    * `replica_cursor` artifact is a [[replicateLake]] destination: any
    * epoch a local writer commits would be silently LWW-stomped by the
    * next replication window (the follower re-applies the primary's
    * changes at a fresh, higher epoch) — data loss with no error. Turn
    * the misconfiguration into the lake's standard loud refusal, matching
    * the cursor-floor and schema-guard refusals. Promote a follower to a
    * writable primary by deleting the cursor artifact (after stopping
    * replication) — the refusal message says so. */
  private def requireNotFollower(spark: SparkSession, corpusDir: String,
      op: String): Unit = {
    val cPath = Similarity.resolveArtifact(spark, corpusDir,
      "replica_cursor")
    require(!graft.sources.Formats.pathExists(spark, cPath),
      s"$op refused: $corpusDir is a replication FOLLOWER " +
        "(replica_cursor present). Local writes would be LWW-stomped by " +
        "the next replicateLake window — write to the primary instead, " +
        "or stop replication and delete the replica_cursor artifact to " +
        "promote this lake")
  }

  /** Commit a net-effect frame into a lake as ONE epoch through the
    * data-first/manifest-last protocol (the [[mergeBranch]] /
    * [[rebaseBranch]] write half). Returns the committed version, or -1
    * on an empty frame. `allowFollower` is the [[replicateLake]]-only
    * bypass — the replicator is the ONE sanctioned follower writer. */
  private def commitNetEffect(spark: SparkSession, local: DataFrame,
      targetDir: String, maintDir: Option[String] = None,
      allowFollower: Boolean = false): Long = {
    import spark.implicits._
    if (!allowFollower)
      requireNotFollower(spark, targetDir, "commit (merge/rebase)")
    if (local.limit(1).count() == 0) return -1L
    // version allocation + data + manifest land under the writer lease:
    // two merges (or a merge racing a replication window) would otherwise
    // double-assign the epoch
    withOpLease(spark, targetDir, "commitNetEffect") { (recheck, tag) =>
      val v = nextLakeVersion(spark, targetDir)
      val nDel = local.filter(col("_deleted")).count()
      val n = local.count()
      // drop any _commit a change-feed source row carried: this epoch's
      // rows belong to THIS writer's commit
      local.drop("epoch", "_commit").withColumn("epoch", lit(v))
        .withColumn("_commit", lit(tag))
        .write.mode("append").parquet(liveTarget(spark, targetDir, "docs"))
      // keep the target's dedup index whole across a merge: the merged
      // live docs' bucket rows land at the merge epoch (data-first, like
      // the stream's own bucket append), so post-merge admission flags
      // near-dups of merged content; merged tombstones write nothing —
      // their stale buckets die at the exact verify, the documented trade
      maintDir.foreach { m =>
        Dedup.bucketRows(Dedup.signRows(
            local.filter(!col("_deleted"))
              .select(col("doc_id"), col("text"))))
          .withColumn("epoch", lit(v))
          .write.mode("append").parquet(
            Similarity.appendTarget(spark, s"$m/buckets"))
      }
      recheck()
      // batch_id = -1: outside the stream's id space, same as deleteDocs
      Seq((v, 0L, n - nDel, 0L, 0L, 0L, -1L, nDel))
        .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
          "n_contaminated", "n_low_quality", "batch_id", "n_deleted")
        .withColumn("committed_at", lit(System.currentTimeMillis()))
        .withColumn("commit_tag", lit(tag))
        .write.mode("append").parquet(manifestTarget(spark, targetDir))
      v
    }
  }

  /** Squash-rebase: rebuild the branch's changes on top of the parent's
    * CURRENT head — `newBranchDir` becomes a fresh branch at head
    * carrying the old branch's net effect as ONE committed epoch (the
    * squash convention: per-epoch branch history collapses, the outcome
    * is preserved). Conflict resolution is the lake's LWW: the replayed
    * epoch allocates past the new base, so for every doc the old branch
    * touched — update or takedown — the branch's view wins over whatever
    * the parent committed meanwhile; everything else serves the parent's
    * new head. O(branch rows); the parent and the OLD branch are
    * untouched (drop the old branch once its consumers re-point — its
    * version space is its own, so lake-fed cursors do NOT carry over).
    * Returns the new base version. */
  def rebaseBranch(spark: SparkSession, dir: String, branchDir: String,
      newBranchDir: String, newName: String,
      maintDir: Option[String] = None): Long = {
    val (parent, base, _) = parentOf(spark, branchDir).getOrElse(
      throw new IllegalArgumentException(
        s"$branchDir is not a branch (no branch_parent pointer)"))
    val newBase = createBranch(spark, dir, parent, newBranchDir, newName)
    commitNetEffect(spark,
      branchNetEffect(spark, branchDir, base), newBranchDir, maintDir)
    newBase
  }

  /** DESCRIBE BRANCHES — the parent's live branches, read from their
    * governance pins: (name, base_version, n_docs at the branch point).
    * A dropped branch releases its pin and leaves this listing. */
  def branches(spark: SparkSession, corpusDir: String): DataFrame =
    pinnedRuns(spark, corpusDir)
      .filter(col("tag").startsWith("branch_"))
      .select(substring(col("tag"), "branch_".length + 1, Int.MaxValue)
          .as("name"),
        col("version").as("base_version"), col("n_docs"))

  /** Continuous lake replication — catch a FOLLOWER lake up to the
    * primary by one CDC window: consume the primary's change feed past
    * the follower-stored cursor and commit it as ONE epoch through the
    * standard data-first/manifest-last protocol (upserts as LWW rows,
    * deletes as tombstones), cursor written LAST. Call it on a cadence
    * (or after each primary commit) and the follower converges to the
    * primary's visible corpus — the DR / read-replica story: O(changes)
    * per window, never a primary rescan, and a crash anywhere re-applies
    * the window as a content-identical epoch the LWW serve collapses.
    * The follower is CONTENT-converged, history-squashed: its version
    * numbers are its own (pin runs / time-travel against the primary;
    * serve reads against either). The follower must not take writes of
    * its own — its next apply would LWW-stomp them. Returns the
    * follower version committed, or None when already caught up. */
  def replicateLake(spark: SparkSession, dir: String, srcCorpusDir: String,
      dstCorpusDir: String): Option[(Long, Long)] = {
    import spark.implicits._
    val cPath = Similarity.resolveArtifact(spark, dstCorpusDir,
      "replica_cursor")
    val from =
      if (graft.sources.Formats.pathExists(spark, cPath))
        cursorValue(spark, cPath)
      else Long.MinValue
    val floor = retentionFloor(spark, srcCorpusDir)
    require(from >= floor || from == Long.MinValue,
      s"replica cursor $from predates the primary's retention floor " +
        s"$floor: the history this window needs was vacuumed — re-seed " +
        "the replica from a fresh bootstrap window")
    val head = manifest(spark, srcCorpusDir)
      .filter(col("version") > from)
      .agg(max(col("version"))).as[Option[Long]].head()
    head match {
      case Some(h) =>
        val changes = readCorpusChanges(spark, dir, srcCorpusDir, from,
          Some(h))
        val extras = changes.columns
          .filterNot(Set("doc_id", "text", "version", "change_type")).toSeq
        val net = changes.select(
          Seq(col("doc_id"), col("text"),
            (col("change_type") === "delete").as("_deleted"),
            col("version").as("epoch")) ++ extras.map(col): _*)
        commitNetEffect(spark, net, dstCorpusDir, allowFollower = true)
        Seq(h).toDF("last_version").write.mode("overwrite")
          .parquet(s"$dstCorpusDir/replica_cursor_compacting")
        Similarity.swapArtifact(spark, dstCorpusDir, "replica_cursor")
        Some((from, h))
      case None => None
    }
  }

  /** Delete a branch and release its hold on the parent's history (the
    * `branch_<name>` pinned run). The branch dir and everything it
    * committed are gone; the parent is untouched. */
  def dropBranch(spark: SparkSession, branchDir: String): Unit = {
    val (parent, _, name) = parentOf(spark, branchDir).getOrElse(
      throw new IllegalArgumentException(
        s"$branchDir is not a branch (no branch_parent pointer)"))
    unpinRun(spark, parent, s"branch_$name")
    val p = new org.apache.hadoop.fs.Path(branchDir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  /** The full per-doc admission audit log (committed epochs only). */
  def admissionLog(spark: SparkSession, corpusDir: String): DataFrame = {
    val p = Similarity.resolveArtifact(spark, corpusDir,
      storeName(spark, corpusDir, "decisions"))
    if (!graft.sources.Formats.pathExists(spark, p))
      // full Curate.admitRows schema — the empty and non-empty paths of a
      // reader must agree on columns
      return spark.range(0).select(col("id").as("doc_id"),
        lit("").as("decision"), lit(0L).as("n_dup_matches"),
        lit(null).cast("long").as("first_dup"),
        lit(0L).as("n_bench_hits"), lit(0.0).as("quality"),
        lit(0L).as("epoch")).limit(0)
    val dec = readStore(spark, corpusDir, "decisions").get
    committedOnly(dec.dropDuplicates(replayKey(dec)),
      manifest(spark, corpusDir), None)
  }

  /** The corpus maintenance loop: one foreachBatch ingest stream that runs
    * admission, appends admitted docs + the full decision audit, commits
    * the epoch with a manifest row LAST, keeps the dedup index self-
    * consistent with the lake (admitted bucket rows appended per batch,
    * folded into the persisted base at the `compactAt` delta fraction —
    * [[Dedup.compactDedupIndex]]'s crash-safe swap), and never touches the
    * serving path: every write is an append, every read is manifest-pinned.
    *
    * Per-batch cost: admission SHUFFLES only batch-and-candidate-sized
    * relations (the index serve joins only the batch's own band keys; the
    * benchmark postings broadcast is bounded; quality is a projection),
    * plus two candidate-bounded column probes — the delta store's
    * candidate prune and the lake text lookup the exact verify pays
    * (semi-joins by candidate id: the stores' key columns are read, but
    * only candidate rows move). The writes are batch-sized appends; the
    * manifest row is ONE row. The optional `profDir` live view adds one
    * base-corpus membership probe per commit (the change feed's
    * documented prior-visibility scan) — at a scale where that matters,
    * run [[refreshProfileFromLake]] on a cadence instead of per commit.
    * `optimizeEvery` > 0 runs [[optimizeCorpusIncremental]] every
    * that-many commits, INSIDE the serialized foreachBatch slot — which
    * is exactly the no-concurrent-append quiescence the live-window pack
    * assumes. Each firing costs O(the window since the last firing),
    * never O(lake) — the full [[optimizeCorpus]] rewrite stays a
    * standalone deep pass an operator schedules like vacuum. The same
    * firing checkpoints the manifest ([[compactManifest]]) whenever its
    * one-file-per-commit backlog passes [[ManifestCheckpointFiles]], so
    * head resolution stays commit-count-independent with no external
    * scheduler.
    *
    * `deleteCol` makes retraction part of the SAME stream: rows whose
    * boolean marker is true are takedowns, committed as admission-exempt
    * tombstones in the batch's epoch (full [[deleteDocs]] semantics —
    * hide + base-shadow + CDC delete + index retraction downstream)
    * inside the serialized writer slot, so the common takedown-feed case
    * needs no ingest quiescence. A doc_id arriving as both upsert and
    * delete in ONE micro-batch is refused loudly (same-epoch LWW is
    * undefined); re-admission in a LATER batch wins over the tombstone
    * as usual.
    *
    * `expectations` puts a declarative schema-quality gate ahead of the
    * content gate ([[Curate.expectationDecision]] — the CHECK-constraint
    * convention): a violating row is rejected as `invalid:<name>` before
    * any content verdict, never enters the lake or the dedup index, and
    * is counted in the manifest's `n_invalid` audit column.
    *
    * `viewDirs` keeps declared [[LakeView]] materialized views live at
    * commit cadence (cursor-protected incremental refresh after each
    * commit, delta fold at the optimize firing) — the same contract as
    * `profDir`, for user-declared aggregates. `leaseWaitMs` is each
    * batch's wait budget behind a LIVE foreign writer-lease holder (a
    * passing OPTIMIZE delays the batch instead of killing the query);
    * past it the batch refuses loudly. 0 = refuse immediately. */
  def maintainCorpusStream(docStream: DataFrame, spark: SparkSession,
      dir: String, indexDir: String, corpusDir: String, maintDir: String,
      compactAt: Double = 0.25,
      profDir: Option[String] = None,
      optimizeEvery: Int = 0,
      carryCols: Seq[String] = Nil,
      deleteCol: Option[String] = None,
      expectations: Seq[(String, org.apache.spark.sql.Column)] = Nil,
      viewDirs: Seq[String] = Nil,
      viewRefreshEvery: Int = 1,
      sharedBucketDirs: Seq[String] = Nil,
      leaseWaitMs: Long = 120 * 1000L)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    import spark.implicits._
    // branch ingest: `sharedBucketDirs(i)` is the i-th ANCESTOR's
    // maintenance bucket store (`<maintDir>/buckets`), so admission
    // dedups against the shared history. Each ancestor's rows count only
    // up to its branch point — the caps are derived from the parent
    // chain HERE, because epoch numbers past a base can numerically
    // collide with the branch's own; appends stay branch-local.
    val sharedStores: Seq[(String, Option[Long])] = {
      var cur = corpusDir
      var cap = Option.empty[Long]
      sharedBucketDirs.map { d =>
        val (p, base, _) = parentOf(spark, cur).getOrElse(
          throw new IllegalArgumentException(
            s"more sharedBucketDirs than ancestors: $cur has no parent"))
        cap = Some(cap.fold(base)(math.min(_, base)))
        cur = p
        d -> cap
      }
    }
    // reserved names: "epoch" would be silently clobbered by the epoch
    // stamp; "version"/"change_type" would collide with the change feed's
    // output columns; "_deleted" (and every "_"-prefixed name — internal
    // namespace) would ride the admission gate and silently activate
    // tombstone semantics with no delete API ever called — fail loudly at
    // wiring time, not in a downstream read
    val reserved = Set("doc_id", "text", "epoch", "version", "change_type")
    require(carryCols.forall(c => !reserved(c) && !c.startsWith("_")),
      s"carryCols may not use reserved names (${reserved.mkString(", ")}) " +
        s"or the internal _-prefix namespace: got ${carryCols.mkString(", ")}")
    // deleteCol = stream-integrated retraction: rows whose marker is true
    // are TAKEDOWNS, committed as tombstones in the same epoch as the
    // batch's admissions — inside the serialized writer slot, so the
    // common takedown-feed case needs no ingest quiescence (the
    // standalone [[deleteDocs]] stays for out-of-band lists). The marker
    // column is stripped before admission and storage.
    deleteCol.foreach { dc =>
      require(!reserved(dc) && !dc.startsWith("_") && !carryCols.contains(dc),
        s"deleteCol '$dc' collides with a reserved/carry name")
      require(docStream.columns.contains(dc),
        s"deleteCol '$dc' is not a column of the stream " +
          s"(${docStream.columns.mkString(", ")})")
    }
    // fail at wiring time when the target is already a follower (the
    // per-batch check below covers a cursor that appears mid-stream)
    requireNotFollower(spark, corpusDir, "maintainCorpusStream")
    var commitsSinceOptimize = 0L
    var commitsSinceViewRefresh = 0L
    val benchPost = graft.sources.Caches.shared(Curate.benchPostings(
      spark, dir, Dedup.incrementalStride(Tables.nDocs(spark, dir))))
    var baseCount = -1L
    var deltaCount = -1L
    docStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // follower refusal — per batch, not just at wiring: a
        // replicateLake window pointed at this dir AFTER the stream
        // started would otherwise LWW-stomp every epoch this stream
        // commits from here on. One FS stat per batch buys the loud stop.
        requireNotFollower(spark, corpusDir, s"ingest stream batch $batchId")
        // replay fast path / collision guard, keyed on the STREAM's batch
        // id (recorded per manifest row), not on the lake version — the
        // version space is the lake's own ([[nextLakeVersion]]: deletes
        // and other maintenance writers commit epochs of their own, so
        // batch ids and versions diverge; the Delta txn-appId convention).
        // A manifest row carrying this batch id means either a
        // checkpoint-replayed batch (crash between the manifest write and
        // the stream's own commit — skipping wholesale IS the exactly-once
        // answer) or an operator error (a fresh checkpoint re-counting
        // batches against a live lake). Either way the lake must not
        // double-write; the skip is loud so the second case can't pass
        // silently. Pre-split manifests have no batch_id column; their
        // rows used version = batch id, so version is the fallback key.
        // LOCAL manifest only: the batch-id space belongs to THIS lake
        // dir's stream — on a branch, the parent stream's batch ids ride
        // the overlay and would phantom-skip the branch's own batches.
        val man0 = localManifest(spark, corpusDir)
        val replayKey =
          if (man0.columns.contains("batch_id"))
            coalesce(col("batch_id"), col("version"))
          else col("version")
        val committed = man0.filter(replayKey === batchId)
          .limit(1).count() > 0
        if (committed) {
          System.err.println(s"[corpus-lake] batch $batchId already " +
            "committed - replay skip (if this is NEW data, the stream is " +
            "running against a stale checkpoint; restart it with its " +
            "original checkpoint location)")
        } else if (!batch.isEmpty)
          // the whole commit (epoch allocation → data appends → manifest
          // row → inline optimize → view refreshes) runs under the writer
          // lease: foreachBatch serializes THIS stream's batches, but only
          // the lease refuses a SECOND process (another stream, an
          // out-of-band deleteDocs, a racing merge) writing the same lake.
          // STABLE owner (maintDir-scoped batch identity): a restarted
          // stream replaying the batch after a hard crash RECLAIMS its own
          // stranded lease by same-owner re-entry instead of stalling for
          // the TTL; leaseWaitMs queues behind a live foreign holder (a
          // passing OPTIMIZE must delay a batch, not kill the query).
          withOpLease(spark, corpusDir, s"ingest-batch-$batchId",
            stableOwner = Some(s"ingest-batch-$batchId@$maintDir"),
            waitMs = leaseWaitMs) { (recheck, tag) =>
          val epoch = nextLakeVersion(spark, corpusDir)
          // stream-integrated takedowns: split the batch on the delete
          // marker; a doc_id may not be upserted AND deleted in one
          // batch — both rows would land at the SAME epoch and the
          // (doc_id, epoch) read dedup would pick one nondeterministically
          val (upserts, deleteIds) = deleteCol match {
            case None => (batch, None)
            case Some(dc) =>
              val marker = coalesce(col(dc).cast("boolean"), lit(false))
              val ups = batch.filter(!marker).drop(dc)
              val del = batch.filter(marker).select(col("doc_id")).distinct()
                .localCheckpoint()
              val clash = ups.select(col("doc_id"))
                .join(del, Seq("doc_id"), "left_semi").limit(1).count()
              require(clash == 0,
                "a doc_id arrives as both an upsert and a delete in one " +
                  "micro-batch — same-epoch LWW is undefined; split them " +
                  "across batches")
              (ups, Some(del))
          }
          // carryCols = schema evolution at the ingest edge: extra
          // metadata columns ride along into the docs store (the gate
          // itself only reads doc_id/text); older epochs without them
          // serve nulls via the mergeSchema read
          val rows = upserts.select(
            (col("doc_id") +: col("text") +: carryCols.map(col)): _*)
          if (carryCols.nonEmpty) validateCarrySchema(spark, corpusDir, rows)
          val store = s"$maintDir/buckets"
          val haveStore = graft.sources.Formats.pathExists(
            spark, Similarity.resolveArtifact(spark, maintDir, "buckets"))
          // the committed frame is built BEFORE this epoch's writes: the
          // index side must see exactly the previously-committed lake
          val man = manifest(spark, corpusDir)
          val decisions = admitBatch(spark, dir, rows, indexDir,
            if (haveStore) Some(store) else None,
            Some(committedOnly(admittedRaw(spark, corpusDir), man, None)),
            benchPost,
            Some(man.select($"version".as("epoch"))),
            expectations, sharedStores).localCheckpoint()
          // decisions is fixed-schema today, but a future admission-gate
          // change against an old lake is the same mergeSchema poisoning
          // risk as an evolved carry column — same write-time guard
          validateCarrySchema(spark, corpusDir,
            decisions.withColumn("epoch", lit(epoch)), "decisions")
          val admitted = rows.join(
            decisions.filter($"decision" === Curate.Admitted)
              .select($"doc_id"), "doc_id")
          admitted.withColumn("epoch", lit(epoch))
            .withColumn("_commit", lit(tag))
            .write.mode("append").parquet(
              liveTarget(spark, corpusDir, "docs"))
          // takedowns commit as tombstones IN this epoch — admission-
          // exempt (a delete is not an arriving document), data landing
          // before the manifest row like every other write
          val nDeleted = deleteIds.fold(0L) { del =>
            val n = del.count()
            // skip the write on delete-less batches: an empty append per
            // micro-batch would be pure file churn for OPTIMIZE to clean
            if (n > 0)
              del.select(col("doc_id"),
                  lit(null).cast("string").as("text"),
                  lit(epoch).as("epoch"), lit(true).as("_deleted"),
                  lit(tag).as("_commit"))
                .write.mode("append").parquet(
                  liveTarget(spark, corpusDir, "docs"))
            n
          }
          decisions.withColumn("epoch", lit(epoch))
            .withColumn("_commit", lit(tag))
            .write.mode("append").parquet(
              liveTarget(spark, corpusDir, "decisions"))
          val newBuckets = Dedup.bucketRows(Dedup.signRows(admitted))
            .withColumn("epoch", lit(epoch))
          val n = newBuckets.count()
          newBuckets.write.mode("append").parquet(
            Similarity.appendTarget(spark, store))
          // the manifest row commits the epoch — LAST, after every data
          // write, and only if this writer STILL holds the lease (a batch
          // that outran the TTL aborts here instead of double-assigning)
          recheck()
          // coalesce: a delete-ONLY epoch has zero decisions, and sum()
          // over an empty frame is NULL — the audit row must carry zeros
          decisions.groupBy()
            .agg(count(lit(1)).as("n_arrived"),
              coalesce(sum(when($"decision" === Curate.Admitted, 1L).otherwise(0L)), lit(0L)).as("n_admitted"),
              coalesce(sum(when($"decision" === Curate.Duplicate, 1L).otherwise(0L)), lit(0L)).as("n_duplicate"),
              coalesce(sum(when($"decision" === Curate.Contaminated, 1L).otherwise(0L)), lit(0L)).as("n_contaminated"),
              coalesce(sum(when($"decision" === Curate.LowQuality, 1L).otherwise(0L)), lit(0L)).as("n_low_quality"),
              // expectation violations (decision `invalid:<name>`) — the
              // audit row must account for every arrival; the column
              // evolved into the manifest schema like batch_id/n_deleted
              coalesce(sum(when($"decision".startsWith(Curate.Invalid + ":"),
                1L).otherwise(0L)), lit(0L)).as("n_invalid"))
            .select(lit(epoch).as("version"), $"n_arrived", $"n_admitted",
              $"n_duplicate", $"n_contaminated", $"n_low_quality",
              lit(batchId).as("batch_id"), lit(nDeleted).as("n_deleted"),
              lit(System.currentTimeMillis()).as("committed_at"),
              $"n_invalid", lit(tag).as("commit_tag"))
            .write.mode("append").parquet(manifestTarget(spark, corpusDir))
          // index upkeep (the maintainDedupIndexStream counters, verbatim)
          if (baseCount < 0) baseCount = spark.read.parquet(
            Similarity.resolveArtifact(spark, indexDir, "buckets")).count()
          if (deltaCount < 0) deltaCount = spark.read.parquet(
            Similarity.resolveArtifact(spark, maintDir, "buckets")).count()
          else deltaCount += n
          if (deltaCount > 0 && deltaCount >= compactAt * baseCount) {
            // fold ONLY committed epochs (this epoch's manifest row just
            // landed — re-read it) and keep uncommitted rows in the store;
            // deltaCount=0 slightly undercounts any surviving crashed rows,
            // which only delays the next trigger
            // the fold doubles as tombstone GC: taken-down docs' stale
            // bucket rows leave the index (verdicts unchanged — their
            // candidates already failed the null-text verify; this just
            // stops paying for them). deletedIds is tombstone-sized and
            // runs only at this cadence.
            Dedup.compactDedupIndex(spark, indexDir, store,
              Some(manifest(spark, corpusDir).select($"version".as("epoch"))),
              retract = Some(deletedIds(spark, corpusDir)))
            baseCount = -1
            deltaCount = 0
          }
          // inline INCREMENTAL optimize at a commit-count cadence:
          // foreachBatch serializes batches, so this slot IS the
          // quiescence the live-store truncation assumes. Cost of each
          // firing is O(the live window since the last firing), NOT
          // O(lake) — appends land in the live/ sub-store and each pass
          // packs only that window into a sorted segment (the full
          // [[optimizeCorpus]] rewrite stays a standalone deep pass for
          // segment merging). The counter counts actual COMMITS (the
          // manifest row above), not streaming batch ids — empty and
          // replay-skipped micro-batches never consume cadence points.
          commitsSinceOptimize += 1
          if (optimizeEvery > 0 && commitsSinceOptimize >= optimizeEvery) {
            optimizeCorpusIncremental(spark, corpusDir)
            // manifest checkpoint at the same cadence, gated on actual
            // backlog (one file per commit accretes a listing cost every
            // read pays): a KB-scale rewrite + pointer flip; superseded
            // generation dirs await the operator's drain-window reclaim
            // like every versioned rewrite
            if (dataFileCount(spark, manifestTarget(spark, corpusDir))
                > ManifestCheckpointFiles)
              compactManifest(spark, corpusDir)
            // zone maps follow the freshly packed layout: profiles ONLY
            // the files this firing created (O(window)), drops rows the
            // live-store truncation removed — pruned reads stay sharp
            // with no standalone stats scheduler
            collectFileStatsIncremental(spark, corpusDir)
            commitsSinceOptimize = 0
          }
          // optional live materialized views: the cursor-protected refresh
          // jobs run AFTER the commit, so a crash between the manifest and
          // this point only leaves a cursor behind — the next batch (or
          // a standalone refresh) catches each view up idempotently.
          // Declarative views ([[LakeView]]) ride the same cadence, with
          // their delta fold at the optimize firing.
          profDir.foreach(p => refreshProfileFromLake(spark, dir, corpusDir, p))
          // N declared views consume this batch's window from ONE shared
          // history build (refreshViews) — the dashboard lake's per-batch
          // maintenance reads the commit feed once, not once per view.
          // viewRefreshEvery > 1 trades freshness for per-batch latency:
          // the refresh fires every k COMMITS and consumes the whole
          // window since each view's cursor in one call (window splits
          // are delta-identical, so skipped batches cost nothing but
          // staleness — the corpus_view_freshness probe measures the
          // per-batch overhead this knob buys back).
          commitsSinceViewRefresh += 1
          if (viewDirs.nonEmpty &&
              commitsSinceViewRefresh >= math.max(1, viewRefreshEvery)) {
            // delta folds ride refreshViews' own lake-version watermark
            // (maybeAutoCompact), NOT the commitsSinceOptimize counter: a
            // counter-coincidence test fires only every
            // lcm(viewRefreshEvery, optimizeEvery) commits (7 and 12 →
            // 84), letting the serve-side backlog grow far past the
            // promised cadence. The watermark compares each view's
            // folded-to version against the lake head, so the fold fires
            // on the first refresh at or past the cadence regardless of
            // how the two counters interleave.
            LakeView.refreshViews(spark, dir, corpusDir, viewDirs,
              compactEvery = optimizeEvery)
            commitsSinceViewRefresh = 0
          }
        }
      }
  }

  // ------------- incremental consumption (CDC reads between versions)

  /** Classify the changes between two corpus snapshots — the generic
    * snapshot-diff operator the lake's incremental reads are specified
    * against. Each side is projected to (doc_id, xxhash64(text), length)
    * BEFORE the full-outer equi-join, so document bodies never move
    * through the shuffle — at 100 TB the join carries 24 bytes/doc, not
    * the corpus. Rows out: (doc_id, change_type insert|update|delete,
    * old_len, new_len); unchanged docs are dropped. `update` means the
    * 64-bit content hashes differ — a hash collision would mask a real
    * update, which at 2⁻⁶⁴ per pair is the standard CDC trade (the oracle
    * twin compares full text and hash-agrees, pinning the fixture). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    // presence is a flag, NOT the text hash: xxhash64(null) is null, so a
    // null-text doc must still count as present (unchanged null ≡ null is
    // dropped via the null-safe compare; text→null is an update)
    val o = oldSnap.select(col("doc_id"), xxhash64(col("text")).as("_oh"),
      length(col("text")).cast("long").as("old_len"), lit(true).as("_oex"))
    val n = newSnap.select(col("doc_id"), xxhash64(col("text")).as("_nh"),
      length(col("text")).cast("long").as("new_len"), lit(true).as("_nex"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("change_type",
        when(col("_oex").isNull, "insert")
          .when(col("_nex").isNull, "delete")
          .when(!(col("_oh") <=> col("_nh")), "update"))
      .filter(col("change_type").isNotNull)
      .select(col("doc_id"), col("change_type"), col("old_len"),
        col("new_len"))
  }

  /** [[snapshotDiff]]'s oracled BATCH twin: two deterministic snapshots
    * carved from the documents table — v1 drops every doc_id ≡ 5 (mod 13)
    * (they become inserts), v2 drops every ≡ 7 (mod 13) (deletes) and
    * appends " v2" to every doc_id ≡ 3 (mod 17) (updates) — diffed by the
    * same operator the lake's change reads use. DuckDB re-derives the diff
    * with full-text comparison, so a hash-classification divergence would
    * hash-mismatch the gate. */
  def changesTwin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (v1, v2) = twinSnapshots(spark, dir)
    // same plan-equality cache as the profile twins: one v1⋈v2 diff per
    // session serves all three diff consumers
    graft.sources.Caches.shared(snapshotDiff(v1, v2)).orderBy($"doc_id")
  }

  /** The deterministic two-snapshot fixture BOTH oracled twins
    * ([[changesTwin]], [[profileTwin]]) carve — one definition so the
    * DuckDB mirrors of the two queries can never silently desynchronize
    * from each other. */
  private def twinSnapshots(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val v1 = docs.filter(col("doc_id") % 13 =!= 5)
    val v2 = docs.filter(col("doc_id") % 13 =!= 7)
      .select(col("doc_id"), when(col("doc_id") % 17 === 3,
        concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
    (v1, v2)
  }

  /** Incremental read of the lake: every doc whose LATEST committed epoch
    * lies in (fromVersion, toVersion] — the change feed a downstream
    * incremental consumer (index refresh, materialized-view maintenance,
    * training-set delta shipping) tails instead of re-diffing snapshots.
    *
    * change_type, against the doc's VISIBLE state at `fromVersion` (the
    * latest committed row there if not a tombstone, else the base-corpus
    * row it would shadow): `update` if it was visible and its latest
    * in-window row is a live document, `insert` if it was not,
    * `delete` (text = null) if its latest in-window row is a
    * [[deleteDocs]] tombstone — and a tombstone for a doc that was NOT
    * visible at the cursor is suppressed entirely (insert + delete inside
    * one window nets to nothing a consumer ever saw). A consumer
    * therefore applies the feed as a pure upsert/retract stream with no
    * state of its own.
    *
    * Cost: the docs scan carries an `epoch > fromVersion` predicate that
    * parquet row-group min/max stats turn into whole-file skips (each
    * epoch's append writes files with a constant epoch column), so the
    * read touches the CHANGED epochs, not the lake; the prior-visibility
    * probe semi-joins base ∪ earlier-lake doc_ids against the changed-id
    * set — one column, pruned to the changes. No explicit broadcast hint:
    * the changed set is window-sized on the incremental path but
    * LAKE-sized on a bootstrap (`fromVersion = Long.MinValue`), and a
    * forced broadcast would OOM the driver exactly there — AQE broadcasts
    * the small incremental case on its own and degrades to a shuffle join
    * for the bootstrap. Nothing scales with corpus size except that one
    * membership probe. */
  def readCorpusChanges(spark: SparkSession, dir: String, corpusDir: String,
      fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    val floor = retentionFloor(spark, corpusDir)
    require(fromVersion >= floor || fromVersion == Long.MinValue,
      s"fromVersion $fromVersion predates the retention floor $floor: " +
        "the visible-at-from state was collapsed by vacuumCorpus")
    val man = manifest(spark, corpusDir)
    val winMan = toVersion.fold(man)(v => man.filter(col("version") <= v))
      .filter(col("version") > fromVersion)
    def deletedFlag(df: DataFrame) =
      if (df.columns.contains("_deleted"))
        coalesce(col("_deleted"), lit(false))
      else lit(false)
    // collapseReplays = false: both consumers below resolve latest-per-doc
    val raw = admittedRaw(spark, corpusDir, collapseReplays = false)
    val changed0 = committedRows(raw.filter(col("epoch") > fromVersion),
        winMan)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    // the changed set is CDC-window-sized by contract and consumed three
    // times (the feed output, the prior-state semi-join, the base-shadow
    // anti-join) — checkpoint it so the store scan + LWW window execute
    // once, not once per consumer (same reasoning as changedHistory's
    // changed-id checkpoint; a bootstrap replay from MinValue is
    // corpus-sized and keeps the plan form)
    val changed = if (fromVersion == Long.MinValue) changed0
      else changed0.localCheckpoint()
    val changedD = changed.withColumn("_del", deletedFlag(changed))
    val changedIds = changed.select(col("doc_id"))
    // the doc's VISIBLE state at fromVersion: latest committed lake row
    // there when one exists (and it is not a tombstone), else the base
    // row — a tombstone at the cursor both hides the doc and shadows its
    // base row, exactly the readCorpusAt contract. Pruned to the changed
    // ids first, so the window runs over candidate history only.
    val priorLatest = committedRows(raw.filter(col("epoch") <= fromVersion),
        man.filter(col("version") <= fromVersion))
      .join(changedIds, Seq("doc_id"), "left_semi")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    val priorVisible = priorLatest
      .withColumn("_del", deletedFlag(priorLatest))
      .filter(!col("_del")).select(col("doc_id"))
    val priorBase = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"))
      .join(changedIds, Seq("doc_id"), "left_semi")
      .join(priorLatest.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val prior = priorVisible.unionByName(priorBase)
      .distinct().withColumn("_prior", lit(true))
    // evolved metadata columns ride the feed (nulls for pre-evolution
    // epochs) — a training-set delta shipment needs them, and the index
    // consumers project them away
    val extras = changed.columns
      .filterNot(Set("doc_id", "text", "epoch", "_deleted")).toSeq
    changedD.join(prior, Seq("doc_id"), "left")
      .filter(!col("_del") || col("_prior").isNotNull)
      .select(Seq(col("doc_id"), col("text"), col("epoch").as("version"),
        when(col("_del"), lit("delete"))
          .when(col("_prior").isNotNull, lit("update"))
          .otherwise(lit("insert")).as("change_type")) ++
        extras.map(col): _*)
  }

  /** Lake-commit-driven lexical index refresh: consume the change feed
    * since the stored cursor and append the changed docs' postings as
    * epoch-stamped segments under the PINNED base statistics — the bridge
    * between the corpus lifecycle and the index lifecycle, so a serving
    * stack follows lake commits instead of running its own parallel
    * ingest stream. Each posting row is stamped with the doc's committed
    * LAKE version (not a local counter): a crashed refresh that re-runs
    * from the old cursor re-appends byte-identical rows, which the
    * (doc_id, tok, epoch) read-side dedup collapses — and an LWW update
    * consumes as a whole-document replacement because
    * [[TextAnalysis.readPostingsDelta]] serves only each doc's latest
    * epoch. Cursor write is LAST (crash-safe ordering) via the same
    * tmp-swap the compactors use. Returns the (from, to] window consumed,
    * or None when the cursor is already at the lake head. */
  def refreshPostingsFromLake(spark: SparkSession, dir: String,
      corpusDir: String, maintDir: String): Option[(Long, Long)] = {
    import spark.implicits._
    val cPath = Similarity.resolveArtifact(spark, maintDir, "lake_cursor")
    val from =
      if (graft.sources.Formats.pathExists(spark, cPath))
        cursorValue(spark, cPath)
      else Long.MinValue
    val head = manifest(spark, corpusDir).agg(max($"version"))
      .as[Option[Long]].head()
    head match {
      case Some(latest) if latest > from =>
        val changes = readCorpusChanges(spark, dir, corpusDir, from,
          Some(latest))
        val upserts = TextAnalysis.encodeForPostings(
            changes.filter($"change_type" =!= "delete")
              .select($"doc_id", $"text", $"version".as("epoch")),
            carry = Seq("epoch"))
          .select($"doc_id", $"dl", $"tok", $"tf", $"epoch")
        // a delete retracts as a TOMBSTONE posting row: null token, so the
        // doc is re-listed in the delta (the anti-join merge drops its
        // base/older postings) while contributing zero scorable rows —
        // the null key can never equi-join a query term. Types mirror the
        // encode exactly so the parquet append stays schema-stable.
        val tombstones = changes.filter($"change_type" === "delete")
          .select($"doc_id", lit(null).cast("int").as("dl"),
            lit(null).cast("string").as("tok"),
            lit(null).cast("long").as("tf"), $"version".as("epoch"))
        upserts.unionByName(tombstones)
          .write.mode("append").parquet(
            Similarity.appendTarget(spark, s"$maintDir/seg"))
        Seq(latest).toDF("last_version")
          .write.mode("overwrite").parquet(s"$maintDir/lake_cursor_compacting")
        Similarity.swapArtifact(spark, maintDir, "lake_cursor")
        Some((from, latest))
      case _ => None
    }
  }

  /** Lake-commit-driven DENSE index refresh — [[refreshPostingsFromLake]]'s
    * twin for the IVF-PQ leg, closing the loop where ONE commit feed
    * drives all three serving indexes (dedup buckets inline in
    * [[maintainCorpusStream]], lexical postings via
    * [[refreshPostingsFromLake]], dense inverted lists here). The
    * embedding step belongs to the CALLER: `embed` maps the change feed
    * (doc_id, text, version, change_type) to (vec_id, embedding, version)
    * rows — at production scale an inference job over the window, in specs
    * a deterministic lookup. The vectors are assigned + PQ-encoded under
    * the PINNED quantizers ([[Similarity.encodeForIndex]] — the FAISS
    * IVF-add contract) and appended stamped with their committed lake
    * version, so a crashed refresh re-appends byte-identical rows that
    * [[Similarity.readIndexDelta]]'s (vec_id, epoch) dedup collapses, and
    * an LWW re-embedding deterministically wins (latest epoch per key).
    * Cursor written LAST via the tmp-swap.
    *
    * `embed` receives only the feed's insert/update rows (a delete has no
    * text to embed); `delete` rows are retracted here: `deleteVecIds`
    * maps them to the index's id space (identity doc_id → vec_id by
    * default — override when the embedding job renames ids) and each
    * becomes a TOMBSTONE list row (null cent_id, null codes) at the
    * delete's lake version. The anti-join merge then drops the doc's
    * base/older list rows while the null cell can never match a probe —
    * the vector is unservable from the delete version on, through both
    * the delta store and any later compaction. */
  def refreshIndexFromLake(spark: SparkSession, dir: String,
      corpusDir: String, maintDir: String,
      embed: DataFrame => DataFrame,
      deleteVecIds: DataFrame => DataFrame =
        _.select(col("doc_id").as("vec_id"), col("version"))): Option[(Long, Long)] = {
    import spark.implicits._
    val cPath = Similarity.resolveArtifact(spark, maintDir, "dense_lake_cursor")
    val from =
      if (graft.sources.Formats.pathExists(spark, cPath))
        cursorValue(spark, cPath)
      else Long.MinValue
    val head = manifest(spark, corpusDir).agg(max($"version"))
      .as[Option[Long]].head()
    head match {
      case Some(latest) if latest > from =>
        val changes = readCorpusChanges(spark, dir, corpusDir, from,
          Some(latest)).localCheckpoint()
        // localCheckpoint: embed is "an inference job over the window" —
        // the encode and the version join must read ONE materialized
        // result, not re-run the inference (and a nondeterministic embed
        // must not diverge between the two branches)
        val vecs = embed(changes.filter($"change_type" =!= "delete"))
          .localCheckpoint()
        val enc = Similarity.encodeForIndex(spark, dir,
          vecs.select($"vec_id", $"embedding"))
        val encCols = enc.columns
        val upserts = enc
          .join(broadcast(vecs.select($"vec_id", $"version")), "vec_id")
          .select(encCols.toIndexedSeq.map(col) :+ $"version".as("epoch"): _*)
        val tombstones = deleteVecIds(
            changes.filter($"change_type" === "delete"))
          .select(col("vec_id") +:
            enc.schema.fields.filterNot(_.name == "vec_id").toSeq
              .map(f => lit(null).cast(f.dataType).as(f.name)) :+
            col("version").as("epoch"): _*)
        upserts.unionByName(tombstones)
          .write.mode("append").parquet(
            Similarity.appendTarget(spark, s"$maintDir/lists"))
        Seq(latest).toDF("last_version").write.mode("overwrite")
          .parquet(s"$maintDir/dense_lake_cursor_compacting")
        Similarity.swapArtifact(spark, maintDir, "dense_lake_cursor")
        Some((from, latest))
      case _ => None
    }
  }

  // ------------- incrementally-maintained materialized profile

  /** Quality-band corpus profile of a (doc_id, text) relation — the
    * materialized aggregate view the lake maintains incrementally:
    * band = floor(round(quality, 6)·10) over [[TextAnalysis.withQuality]]'s
    * linear score, with per-band doc/token/char totals. One projection +
    * one partial-aggregated groupBy; the profile is O(bands) rows. */
  def profileOf(docs: DataFrame): DataFrame =
    TextAnalysis.withQuality(docs)
      .select(floor(round(col("quality"), 6) * 10).cast("int").as("band"),
        size(tokens(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("nc")).as("n_chars"))

  /** Per-band signed contribution rows (+1 additions, −1 retractions). */
  private def signedProfile(docs: DataFrame, sign: Int): DataFrame =
    profileOf(docs).select(col("band"),
      (col("n_docs") * sign).as("n_docs"),
      (col("n_tokens") * sign).as("n_tokens"),
      (col("n_chars") * sign).as("n_chars"))

  /** The signed profile deltas of EVERY committed version in
    * (from, head], in ONE pass: each changed doc's committed history
    * (plus its shadowed base row at −∞) is lag-windowed per doc_id, so a
    * row knows the text it replaced; in-window rows contribute +new and
    * −prev per (band, version). One shuffle on doc_id for the lag, one
    * partial-aggregated groupBy on (band, version) — a bootstrap over
    * thousands of commits is ONE job, not a driver loop of per-version
    * jobs. Deterministic per version regardless of the window that
    * computed it (the lag sees the full history either way), which is
    * what makes maintenance idempotent: a replayed or re-split window
    * recomputes byte-identical (band, version) rows that collapse on
    * read. */
  private def windowDeltas(spark: SparkSession, dir: String,
      corpusDir: String, from: Long, head: Long): DataFrame = {
    val committed = committedRows(admittedRaw(spark, corpusDir),
      manifest(spark, corpusDir).filter(col("version") <= head))
    val changedIds = committed.filter(col("epoch") > from)
      .select(col("doc_id")).distinct()
    // no broadcast hint: the changed set is bootstrap-unbounded (see
    // readCorpusChanges) — AQE broadcasts the incremental case itself
    val delFlag =
      if (committed.columns.contains("_deleted"))
        coalesce(col("_deleted"), lit(false))
      else lit(false)
    val hist = committed
      .join(changedIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"), col("epoch"), delFlag.as("_del"))
    val baseRows = Tables.spread(Tables.documents(spark, dir))
      .join(changedIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"), lit(Long.MinValue).as("epoch"),
        lit(false).as("_del"))
    val seq = hist.unionByName(baseRows)
      .withColumn("prev_text", lag(col("text"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch"))))
      .filter(col("epoch") > from)
    // a tombstone ([[deleteDocs]]) adds nothing — it only retracts the
    // text it replaced; and a row whose predecessor was a tombstone (a
    // re-admission) retracts nothing, which the prev_text null filter
    // already handles (tombstone text is null by construction)
    val plus = signedProfileRows(
      seq.filter(!col("_del"))
        .select(col("text"), col("epoch").as("version")), 1)
    val minus = signedProfileRows(
      seq.filter(col("prev_text").isNotNull)
        .select(col("prev_text").as("text"), col("epoch").as("version")), -1)
    plus.unionByName(minus)
      .groupBy(col("band"), col("version"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("band"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("version"))
  }

  /** Per-(band, version) signed contribution rows. */
  private def signedProfileRows(texts: DataFrame, sign: Int): DataFrame =
    TextAnalysis.withQuality(texts)
      .select(floor(round(col("quality"), 6) * 10).cast("int").as("band"),
        col("version"),
        size(tokens(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("band"), col("version"))
      .agg((count(lit(1)) * sign).as("n_docs"),
        (sum(col("n_toks")) * sign).as("n_tokens"),
        (sum(col("nc")) * sign).as("n_chars"))

  /** Materialize the base corpus's profile — the view's starting state. */
  def initProfile(spark: SparkSession, dir: String, profDir: String): Unit =
    profileOf(Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$profDir/base")

  /** Incremental materialized-view maintenance from lake commits: append
    * the signed profile deltas of every committed version past the cursor
    * ([[windowDeltas]] — ONE pass for the whole window) keyed
    * (band, version), then advance the cursor (tmp-swap, written LAST).
    * Cost per refresh ∝ the committed window's changed docs — the view
    * never recomputes over the corpus.
    * Crash anywhere: the cursor stays behind, the re-run recomputes byte-
    * identical per-version rows, and the (band, version) read-side dedup
    * collapses them — the same idempotency contract as every other
    * epoch-stamped store in the library. Returns the (from, to] window
    * consumed, or None at the lake head. */
  def refreshProfileFromLake(spark: SparkSession, dir: String,
      corpusDir: String, profDir: String): Option[(Long, Long)] = {
    import spark.implicits._
    val cPath = Similarity.resolveArtifact(spark, profDir, "cursor")
    val from =
      if (graft.sources.Formats.pathExists(spark, cPath))
        cursorValue(spark, cPath)
      else Long.MinValue
    // a vacuum past the cursor collapsed history this window's retractions
    // need (the lag would see the floor-state instead of the version the
    // consumed deltas retracted against — silently wrong forever). A fresh
    // bootstrap (no deltas ever written) is safe at any floor: its deltas
    // telescope from whatever floor-state survives. Same refusal contract
    // as readCorpusChanges, for the same reason.
    val floor = retentionFloor(spark, corpusDir)
    require(from >= floor ||
        (from == Long.MinValue &&
          !graft.sources.Formats.pathExists(spark,
            Similarity.resolveArtifact(spark, profDir, "delta"))),
      s"profile cursor $from predates the retention floor $floor: the " +
        "history this window's retractions need was vacuumed — rebuild " +
        "the view (initProfile + fresh refresh) instead")
    val head = manifest(spark, corpusDir)
      .filter(col("version") > from)
      .agg(max(col("version"))).as[Option[Long]].head()
    head match {
      case Some(h) =>
        // resolve before the append: an interrupted compaction swap must
        // promote the surviving `delta_compacting` FIRST, or this append
        // would create a fresh main dir that strands it forever
        windowDeltas(spark, dir, corpusDir, from, h)
          .write.mode("append").parquet(
            Similarity.resolveArtifact(spark, profDir, "delta"))
        Seq(h).toDF("last_version")
          .write.mode("overwrite").parquet(s"$profDir/cursor_compacting")
        Similarity.swapArtifact(spark, profDir, "cursor")
        Some((from, h))
      case None => None
    }
  }

  /** Serve the maintained profile: base + deduped signed deltas ABOVE the
    * base's folded-through watermark, summed per band; bands whose every
    * total cancelled to zero are dropped (they match a recompute, which
    * never lists them). O(bands·versions) rows in, O(bands) out — never
    * the corpus. The watermark (`_folded_to`, −∞ on a fresh base) is what
    * makes [[compactProfile]] crash-safe for an ADDITIVE store: deltas at
    * or below it are already inside the base and are excluded here, so a
    * crash between the base swap and the delta truncate cannot double-
    * count. */
  def profile(spark: SparkSession, profDir: String): DataFrame = {
    val base = spark.read.parquet(
      Similarity.resolveArtifact(spark, profDir, "base"))
    val (baseRows, foldedTo) =
      if (base.columns.contains("_folded_to")) {
        import spark.implicits._
        (base.drop("_folded_to"),
          base.agg(max(col("_folded_to"))).as[Long].head())
      } else (base, Long.MinValue)
    val deltaPath = Similarity.resolveArtifact(spark, profDir, "delta")
    val rows =
      if (!graft.sources.Formats.pathExists(spark, deltaPath)) baseRows
      else baseRows.unionByName(
        spark.read.parquet(deltaPath)
          .dropDuplicates("band", "version")
          .filter(col("version") > foldedTo).drop("version"))
    rows.groupBy(col("band"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .filter(!(col("n_docs") === 0 && col("n_tokens") === 0 &&
        col("n_chars") === 0))
  }

  /** Fold the view's delta rows into its base — the compaction that keeps
    * the additive store from growing with the commit count, OFF the
    * serving path (the [[Similarity.compactIndex]] twin for the view).
    * An additive store cannot rely on keyed idempotency the way the index
    * compactors do (re-adding a folded delta WOULD double-count), so the
    * ordering carries a watermark instead: the merged base lands with
    * `_folded_to` = the highest folded version via the `_compacting` swap
    * FIRST, and only then does the delta truncate — at every crash point
    * [[profile]] serves each version's delta exactly once (from the delta
    * below the swap, from the base above it). Serving before ≡ after.
    * The truncate is BOUNDED by the folded watermark — rows above it
    * (a refresh that ran between the fold's read and here) are kept, not
    * wiped; like every whole-artifact rewrite, the swap itself must not
    * race a concurrent appender (run compaction from the maintenance
    * cadence, as [[maintainCorpusStream]] does). */
  def compactProfile(spark: SparkSession, profDir: String): Unit = {
    import spark.implicits._
    val deltaPath = Similarity.resolveArtifact(spark, profDir, "delta")
    if (!graft.sources.Formats.pathExists(spark, deltaPath)) return
    val head = spark.read.parquet(deltaPath)
      .agg(max(col("version"))).as[Option[Long]].head()
    head.foreach { h =>
      profile(spark, profDir)
        .withColumn("_folded_to", lit(h))
        .write.mode("overwrite").parquet(s"$profDir/base_compacting")
      Similarity.swapArtifact(spark, profDir, "base")
      spark.read.parquet(deltaPath).filter(col("version") > h)
        .write.mode("overwrite").parquet(s"$profDir/delta_compacting")
      Similarity.swapArtifact(spark, profDir, "delta")
    }
  }

  /** The maintenance algebra's oracled BATCH twin: [[changesTwin]]'s two
    * snapshot views, with v2's profile computed INCREMENTALLY — v1's
    * profile plus signed contributions for exactly the diffed docs (+new
    * for inserts/updates, −old for updates/deletes) — while DuckDB
    * recomputes v2's profile directly. Hash equality pins the retraction
    * algebra end-to-end (the lake's [[versionDelta]] is this same signed
    * fold, keyed per committed version). */
  /** v1's per-doc quality projection, shared by BOTH profile twins' v1
    * legs (the full-corpus scan and the diff-sized minus leg) and across
    * the two twins within a session (plan-equality cache): doc_id + the
    * three band counters, ~25 bytes/row — the narrow-proxy posture
    * (guide §8: the corpus text is decoded and quality-scored ONCE; every
    * later consumer moves evaluated values). Before this, corpus_profile's
    * plan ran the v1 scan three times (profile leg, minus leg, diff old
    * side) and the v1⋈v2 diff twice (once under each broadcast build) —
    * 13 warm jobs for a bands-sized result. */
  private def perDocProfile(v1: DataFrame): DataFrame =
    graft.sources.Caches.shared(
      TextAnalysis.withQuality(v1)
        .select(col("doc_id"),
          floor(round(col("quality"), 6) * 10).cast("int").as("band"),
          size(tokens(col("text"))).cast("long").as("n_toks"),
          length(col("text")).cast("long").as("nc")))

  /** Per-band signed aggregate of a [[perDocProfile]] slice — the same
    * (band, n_docs, n_tokens, n_chars) rows [[signedProfile]] derives
    * from raw (doc_id, text). */
  private def signedOfPerDoc(rows: DataFrame, sign: Int): DataFrame =
    rows.groupBy(col("band"))
      .agg((count(lit(1)) * sign).as("n_docs"),
        (sum(col("n_toks")) * sign).as("n_tokens"),
        (sum(col("nc")) * sign).as("n_chars"))

  def profileTwin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (v1, v2) = twinSnapshots(spark, dir)
    // the diff is consumed by BOTH broadcast builds (and by the drift
    // twin in the same session): plan-equality cache so the v1⋈v2
    // full-outer join runs once, not once per consumer
    val diff = graft.sources.Caches.shared(snapshotDiff(v1, v2))
    val q1 = perDocProfile(v1)
    val plus = v2.join(broadcast(diff
        .filter($"change_type".isin("insert", "update")).select($"doc_id")),
      Seq("doc_id"), "left_semi")
    val minus = q1.join(broadcast(diff
        .filter($"change_type".isin("update", "delete")).select($"doc_id")),
      Seq("doc_id"), "left_semi")
    signedOfPerDoc(q1, 1)
      .unionByName(signedProfile(plus, 1))
      .unionByName(signedOfPerDoc(minus, -1))
      .groupBy($"band")
      .agg(sum($"n_docs").as("n_docs"), sum($"n_tokens").as("n_tokens"),
        sum($"n_chars").as("n_chars"))
      .filter(!($"n_docs" === 0 && $"n_tokens" === 0 && $"n_chars" === 0))
      .orderBy($"band")
  }

  /** Per-band quality-distribution SHIFT between consecutive profile
    * versions — the data-quality drift alarm a training pipeline runs on
    * every commit: a crawl-source change or a scraper regression shows up
    * as probability mass moving between quality bands long before any
    * model metric moves. v2's profile comes through the same incremental
    * signed algebra the materialized view maintains (never a corpus
    * recompute — the deltas are the diffed docs only); the shift is each
    * band's doc-share change in parts-per-million (integer, so the oracle
    * hash is representation-exact), flagged past [[ProfileShiftPpm]].
    * Cost beyond the profile itself: two KB-scale per-band aggregates and
    * a band-count-sized join — free at any corpus size. */
  def profileDriftTwin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (v1, v2) = twinSnapshots(spark, dir)
    // same shared diff + per-doc v1 projection as [[profileTwin]] (one
    // v1⋈v2 join and one v1 quality scan per SESSION across both twins,
    // instead of two of each per twin)
    val diff = graft.sources.Caches.shared(snapshotDiff(v1, v2))
    val q1 = perDocProfile(v1)
    val plus = v2.join(broadcast(diff
        .filter($"change_type".isin("insert", "update")).select($"doc_id")),
      Seq("doc_id"), "left_semi")
    val minus = q1.join(broadcast(diff
        .filter($"change_type".isin("update", "delete")).select($"doc_id")),
      Seq("doc_id"), "left_semi")
    // ONE union-aggregate instead of two per-version profiles: the v1 leg
    // contributes to both counters (v2's profile = v1's + signed deltas),
    // so the full-corpus quality scan runs ONCE — the plus/minus legs are
    // diff-sized subsets
    val joined = signedOfPerDoc(q1, 1)
      .select($"band", $"n_docs".as("d1"), $"n_docs".as("d2"))
      .unionByName(signedProfile(plus, 1)
        .select($"band", lit(0L).as("d1"), $"n_docs".as("d2")))
      .unionByName(signedOfPerDoc(minus, 1)
        .select($"band", lit(0L).as("d1"), (-$"n_docs").as("d2")))
      .groupBy($"band")
      .agg(sum($"d1").as("n_docs_v1"), sum($"d2").as("n_docs_v2"))
      .filter(!($"n_docs_v1" === 0 && $"n_docs_v2" === 0))
    val w = Window.partitionBy()
    joined
      .withColumn("shift_ppm",
        round(($"n_docs_v2" * lit(1e6) / sum($"n_docs_v2").over(w)) -
          ($"n_docs_v1" * lit(1e6) / sum($"n_docs_v1").over(w)))
          .cast("long"))
      .withColumn("shifted", abs($"shift_ppm") > lit(ProfileShiftPpm))
      .select($"band", $"n_docs_v1", $"n_docs_v2", $"shift_ppm", $"shifted")
      .orderBy($"band")
  }

  /** Per-band doc-share shift (ppm) past which [[profileDriftTwin]] raises
    * its flag: 2% of the corpus moving into or out of one quality band. */
  val ProfileShiftPpm = 20000L

  /** Manifest file-count backlog past which the inline optimize cadence
    * checkpoints the commit history ([[compactManifest]]). */
  val ManifestCheckpointFiles = 64L

  // ------------- retention (vacuum)

  /** The lake's retention floor: the lowest version [[readCorpusAt]] may
    * still pin ([[Long.MinValue]] when no vacuum has run). */
  def retentionFloor(spark: SparkSession, corpusDir: String): Long = {
    val p = Similarity.resolveArtifact(spark, corpusDir, "retention")
    if (!graft.sources.Formats.pathExists(spark, p)) Long.MinValue
    else {
      import spark.implicits._
      // listing-signature memo: the floor gates every pinned read; the
      // artifact only changes at a vacuum (which rewrites the dir)
      graft.sources.Caches.bySignature[Long](spark, "retention_floor", p) {
        spark.read.parquet(p).agg(max($"min_version")).as[Long].head()
      }
    }
  }

  // ------------- run pinning (reproducible training corpora)

  /** Pin the lake's current head as a named training run: a run manifest
    * row (tag, version, doc count at pin time) under `runs/<tag>`. A
    * pinned run makes the snapshot a REPRODUCIBILITY contract:
    * [[readRunCorpus]] serves exactly the pinned version forever, and
    * [[vacuumCorpus]] refuses to raise the retention floor past any
    * pinned run — the governance loop a "what data was model X trained
    * on" audit needs. Returns the pinned version. Pinning an existing tag
    * is refused (a run is immutable; unpin first). */
  def pinRun(spark: SparkSession, dir: String, corpusDir: String,
      tag: String): Long = {
    import spark.implicits._
    require(tag.nonEmpty && tag.matches("[A-Za-z0-9_\\-]+"),
      s"run tag must be [A-Za-z0-9_-]+, got '$tag'")
    val p = s"$corpusDir/runs/$tag"
    require(!graft.sources.Formats.pathExists(spark, p),
      s"run '$tag' is already pinned (unpin it first to re-pin)")
    val head = manifest(spark, corpusDir).agg(max($"version"))
      .as[Option[Long]].head()
      .getOrElse(throw new IllegalArgumentException(
        "cannot pin a run on a lake with no committed epochs"))
    val nDocs = readCorpusAt(spark, dir, corpusDir, Some(head)).count()
    Seq((tag, head, nDocs)).toDF("tag", "version", "n_docs")
      .write.mode("errorifexists").parquet(p)
    head
  }

  /** All pinned runs: (tag, version, n_docs). */
  def pinnedRuns(spark: SparkSession, corpusDir: String): DataFrame = {
    val p = s"$corpusDir/runs"
    val empty = spark.range(0).select(lit("").as("tag"),
      col("id").as("version"), lit(0L).as("n_docs")).limit(0)
    if (!graft.sources.Formats.pathExists(spark, p)) return empty
    // an unpin may leave runs/ present but fileless — serve the empty frame
    try spark.read.option("recursiveFileLookup", "true").parquet(p)
    catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  /** Release a pinned run (its snapshot becomes vacuumable again). */
  def unpinRun(spark: SparkSession, corpusDir: String, tag: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$corpusDir/runs/$tag")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  /** The corpus exactly as training run `tag` saw it. */
  def readRunCorpus(spark: SparkSession, dir: String, corpusDir: String,
      tag: String): DataFrame = {
    import spark.implicits._
    val v = pinnedRuns(spark, corpusDir).filter(col("tag") === tag)
      .select(col("version")).as[Long].collect()
    require(v.nonEmpty, s"no pinned run '$tag'")
    readCorpusAt(spark, dir, corpusDir, Some(v.head))
  }

  // ------------- maintenance writer lease (single-writer enforcement)

  /** Acquire the lake's maintenance-writer lease, or refuse. The lake's
    * concurrency model is single maintenance writer, many readers — a
    * discipline the in-process foreachBatch slot serializes for free but
    * nothing enforced ACROSS processes until now: two schedulers both
    * firing OPTIMIZE, or a vacuum racing a deleteDocs, silently corrupt
    * nothing (every write is an append or a swap) but can lose one
    * writer's commit at a pointer flip. The lease makes the discipline
    * explicit: one `_writer_lease` file, created atomically
    * (`create(overwrite = false)` — the HDFS/local-FS primitive that
    * either wins or throws), carrying the owner tag. A holder crash is
    * recovered by TTL: a lease older than `ttlMs` is stale and taken over
    * (delete + atomic re-create; one contender wins the create, losers
    * see exists → refuse).
    *
    * Honest scope — this is ADVISORY, not airtight fencing: a zombie
    * holder that resumes AFTER its lease was taken over can still write
    * (object stores without CAS cannot give more). The manifest-last
    * protocol bounds the damage to the documented single-writer race
    * (a lost append at a flip), and [[heldWriterLease]] lets long
    * maintenance re-verify ownership immediately before its commit
    * point, narrowing the window to one filesystem round-trip. */
  def acquireWriterLease(spark: SparkSession, corpusDir: String,
      owner: String, ttlMs: Long = 15 * 60 * 1000L): Boolean = {
    require(owner.nonEmpty, "lease owner tag must be non-empty")
    val p = new org.apache.hadoop.fs.Path(s"$corpusDir/_writer_lease")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(owner.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return true
    // same-owner re-entry: the lease already carries OUR tag — a crashed
    // prior incarnation of this logical writer (a restarted ingest stream
    // replaying its batch under its STABLE owner). Reclaim immediately
    // instead of stranding the writer behind its own lease for the full
    // TTL; two live instances of one logical owner cannot exist (the
    // stream's checkpoint lock serializes restarts). Reclaim by
    // restamping the EXISTING file's mtime (setTimes), NOT by returning
    // on the owner check alone and NOT by delete + re-create: the restamp
    // RESTARTS the TTL clock (the crashed incarnation's mtime is already
    // partly spent — keeping it would invite a mid-batch takeover) while
    // the file itself never disappears, so a queued foreign contender's
    // tryCreate can never win a gap that a delete would open — the
    // restarting stream cannot lose its own lease to its own re-entry.
    // The re-read after the restamp closes the window where a concurrent
    // stale takeover (delete + create) lands between our check and our
    // return; a lost takeover race falls through to the stale path,
    // which re-validates. Hadoop's BASE FileSystem.setTimes is a silent
    // no-op (connectors that never override it return without touching
    // the mtime), so the restamp is only trusted after a re-stat proves
    // the clock actually moved STRICTLY forward — otherwise re-entry
    // would return true with the crashed incarnation's spent TTL and the
    // mid-batch-takeover window the restamp exists to close would be
    // back. Where it didn't move, fall back to delete + atomic create:
    // that re-opens the one-round-trip gap a queued contender could win,
    // but ONLY on filesystems where the gapless restamp is unavailable,
    // and a lost race there falls through to the stale path below which
    // re-validates rather than double-granting.
    if (heldWriterLease(spark, corpusDir, owner)) {
      val prev = try Some(fs.getFileStatus(p).getModificationTime)
        catch { case _: java.io.FileNotFoundException => None }
      // strictly past the old stamp even when re-entry lands in the same
      // millisecond the crashed incarnation created the lease in
      val now = math.max(System.currentTimeMillis(),
        prev.getOrElse(Long.MinValue) + 1)
      val restamped =
        (try { fs.setTimes(p, now, now); true }
         catch { case _: java.io.IOException => false }) && {
          val after = try Some(fs.getFileStatus(p).getModificationTime)
            catch { case _: java.io.FileNotFoundException => None }
          after.exists(a => prev.forall(a > _))
        }
      if (restamped && heldWriterLease(spark, corpusDir, owner)) return true
      if (!restamped && heldWriterLease(spark, corpusDir, owner) &&
          (try { fs.delete(p, false); true }
           catch { case _: java.io.IOException => false }) &&
          tryCreate() && heldWriterLease(spark, corpusDir, owner))
        return true
    }
    // held by another: stale (holder crashed past its TTL) → take over,
    // else refuse
    val st = try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    val stale = st.forall(s =>
      System.currentTimeMillis() - s.getModificationTime > ttlMs)
    stale && {
      // two LIVE contenders can both observe the same stale lease; without
      // re-validation contender B would execute its already-decided delete
      // on A's FRESH lease and both would return true. Two narrowings:
      // re-stat immediately before the delete (abort if the lease changed
      // since the staleness check), and re-READ after the create (catch a
      // takeover that landed between our create and now). The residual
      // window is one filesystem round-trip — the documented advisory
      // bound, same class as the zombie-holder caveat.
      val cur = try Some(fs.getFileStatus(p))
        catch { case _: java.io.FileNotFoundException => None }
      val unchanged = (st, cur) match {
        case (Some(a), Some(b)) =>
          a.getModificationTime == b.getModificationTime
        case (None, None) => true
        case _ => false
      }
      unchanged &&
        (try { fs.delete(p, false); true }
         catch { case _: java.io.IOException => false }) &&
        tryCreate() && heldWriterLease(spark, corpusDir, owner)
    }
  }

  /** True iff `owner` currently holds the lease — the pre-commit
    * re-verification a long rewrite runs before its pointer flip. */
  def heldWriterLease(spark: SparkSession, corpusDir: String,
      owner: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$corpusDir/_writer_lease")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      val in = fs.open(p)
      try {
        // read to EOF: Hadoop streams may return fewer bytes than
        // available, and a truncated owner tag would make a VALID holder
        // see false — safe pre-commit, but releaseWriterLease would then
        // skip its delete and leak the lease until TTL takeover
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.size() > 0 && new String(out.toByteArray, "UTF-8") == owner
      } finally in.close()
    } catch { case _: java.io.IOException => false }
  }

  /** Release the lease IF `owner` holds it (releasing someone else's —
    * e.g. after a TTL takeover the zombie never observed — is a no-op). */
  def releaseWriterLease(spark: SparkSession, corpusDir: String,
      owner: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$corpusDir/_writer_lease")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (heldWriterLease(spark, corpusDir, owner)) fs.delete(p, false)
  }

  /** Backdate the lease file's mtime by `ageMs` — the deterministic way
    * to exercise TTL-expiry paths ([[leaseRefusalTwin]], specs) without a
    * wall-clock sleep on a hash-gated path. Ops-legitimate too: an
    * operator who KNOWS a holder is dead can age its lease instead of
    * waiting out the TTL. No-op if no lease exists. */
  def backdateWriterLease(spark: SparkSession, corpusDir: String,
      ageMs: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$corpusDir/_writer_lease")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val t = System.currentTimeMillis() - ageMs
    try fs.setTimes(p, t, t)
    catch { case _: java.io.FileNotFoundException => () }
  }

  /** Acquire the lease, WAITING for a live holder to finish: bounded
    * exponential backoff (50 ms doubling to 2 s) until `timeoutMs`, then
    * false. The scheduler convenience over [[acquireWriterLease]]'s
    * immediate refusal — two cooperating maintenance jobs on one lake
    * SERIALIZE instead of one failing (the optimistic-concurrency
    * posture: a conflict is a wait, not an error, while the holder is
    * live; a crashed holder's lease falls to the TTL takeover inside
    * each retry). Polling a file stat is the right primitive here: the
    * lease is lake-level metadata, contended by maintenance jobs at
    * human cadence, not a hot lock. */
  def awaitWriterLease(spark: SparkSession, corpusDir: String,
      owner: String, ttlMs: Long = 15 * 60 * 1000L,
      timeoutMs: Long = 60 * 1000L): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 50L
    var got = acquireWriterLease(spark, corpusDir, owner, ttlMs)
    while (!got && System.currentTimeMillis() < deadline) {
      Thread.sleep(math.max(1L, math.min(backoff,
        deadline - System.currentTimeMillis())))
      backoff = math.min(backoff * 2, 2000L)
      got = acquireWriterLease(spark, corpusDir, owner, ttlMs)
    }
    got
  }

  /** Run `body` under the writer lease, releasing on every exit path;
    * throws [[IllegalStateException]] when the lease is held elsewhere —
    * the scheduler's retry signal, never a silent concurrent rewrite. */
  def withWriterLease[T](spark: SparkSession, corpusDir: String,
      owner: String, ttlMs: Long = 15 * 60 * 1000L)(body: => T): T = {
    if (!acquireWriterLease(spark, corpusDir, owner, ttlMs))
      throw new IllegalStateException(
        s"write refused: $corpusDir's maintenance writer lease is HELD " +
          "by another writer (_writer_lease present and fresh). Two " +
          "concurrent lake writers can double-assign an epoch or race a " +
          "store-pointer flip — wait for the holder to finish (a crashed " +
          "holder's lease is taken over automatically after its TTL)")
    try body finally releaseWriterLease(spark, corpusDir, owner)
  }

  /** Every lake WRITE entry point ([[deleteDocs]], [[commitNetEffect]]'s
    * merge/rebase/replicate callers, each [[maintainCorpusStream]]
    * micro-batch) runs its commit under a lease via this wrapper, so the
    * single-writer discipline the lake documents is ENFORCED with the
    * standard loud refusal, not just assumed. The owner tag defaults to
    * unique-per-operation — these writers never nest each other (the
    * stream's inline optimize fires inside its own batch's lease), and a
    * second concurrent writer is exactly what must refuse; the stream
    * passes a STABLE owner (checkpoint-scoped batch identity) so its own
    * crashed incarnation's lease is reclaimed by re-entry, not waited
    * out. `waitMs` > 0 queues behind a LIVE holder ([[awaitWriterLease]])
    * before refusing — the stream's posture, where a transient OPTIMIZE
    * holding the lake must delay a batch, not kill the query.
    *
    * `body` receives a RECHECK thunk and the lease OWNER TAG. Call the
    * thunk immediately before the manifest-row commit: it re-verifies
    * ownership (one FS round-trip) and throws if the lease was taken
    * over while a long body overran the TTL — the taken-over writer then
    * ABORTS without committing, so two manifest rows can never land for
    * one allocated version. Data files it already appended stay orphans
    * the manifest never admits: every data row the body writes carries
    * the owner tag as its `_commit` column and the manifest row carries
    * it as `commit_tag`, so the read-side pair filter
    * ([[committedRows]]) excludes a zombie's rows even when a NEW holder
    * later commits the SAME version number — the orphan-ADOPTION window
    * the epoch-only semi-join had is closed at the row level, not just
    * narrowed to one FS round-trip. Vacuum reclaims the orphans by the
    * same pair test. */
  private[graft] def withOpLease[T](spark: SparkSession, corpusDir: String,
      op: String, stableOwner: Option[String] = None,
      waitMs: Long = 0L)(body: (() => Unit, String) => T): T = {
    val owner = stableOwner.getOrElse(
      s"$op-" + java.util.UUID.randomUUID().toString)
    val got =
      if (waitMs > 0L)
        awaitWriterLease(spark, corpusDir, owner, timeoutMs = waitMs)
      else acquireWriterLease(spark, corpusDir, owner)
    if (!got)
      throw new IllegalStateException(
        s"write refused: $corpusDir's maintenance writer lease is HELD " +
          "by another writer (_writer_lease present and fresh). Two " +
          "concurrent lake writers can double-assign an epoch or race a " +
          "store-pointer flip — wait for the holder to finish (a crashed " +
          "holder's lease is taken over automatically after its TTL)")
    val recheck: () => Unit = () =>
      if (!heldWriterLease(spark, corpusDir, owner))
        throw new IllegalStateException(
          s"lease lost mid-operation: $corpusDir's writer lease was " +
            s"taken over while '$op' ran past its TTL — aborting BEFORE " +
            "the manifest commit; no epoch was committed (appended data " +
            "files are orphans the next vacuum reclaims)")
    try body(recheck, owner)
    finally releaseWriterLease(spark, corpusDir, owner)
  }

  /** The writer-lease protocol's ORACLED surface: run the full
    * refusal / queue-timeout / re-entry / TTL-takeover / recheck-abort
    * lifecycle against a throwaway lake dir and return one
    * (step, action, outcome) row per protocol step — deterministic
    * outcome rows the driver's hash gate pins, so the single-writer
    * discipline sits under the same oracle as every relational operator
    * (the DuckDB twin is a constant VALUES table). Timing-free by
    * construction: the takeover ages the lease by BACKDATING its mtime
    * ([[backdateWriterLease]]) rather than sleeping, the
    * queue test times out against a FRESH lease (never a steal), and
    * the recheck abort simulates the overrun with an explicit release —
    * no step depends on wall-clock races. The protocol releases every
    * lease it takes, so repeat calls on the memoized dir are identical. */
  def leaseRefusalTwin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lake = graft.sources.Caches.memoizedValue[String](spark,
        s"corpus-lease-twin|$dir") {
      java.nio.file.Files.createTempDirectory("graft-lease-twin").toString
    }
    val steps = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    def rec(action: String, outcome: String): Unit =
      steps += ((steps.size + 1, action, outcome))
    def granted(b: Boolean): String = if (b) "granted" else "refused"
    rec("acquire", granted(acquireWriterLease(spark, lake, "writer-a")))
    rec("second_writer", granted(acquireWriterLease(spark, lake, "writer-b")))
    rec("same_owner_reentry",
      granted(acquireWriterLease(spark, lake, "writer-a")))
    rec("await_live_holder",
      if (awaitWriterLease(spark, lake, "writer-b", timeoutMs = 250L))
        "granted" else "timeout")
    releaseWriterLease(spark, lake, "writer-a")
    rec("after_release", granted(acquireWriterLease(spark, lake, "writer-b")))
    // age writer-b's lease past the 1 ms TTL below by BACKDATING its
    // mtime — zero wall-clock dependence on this hash-gated path (a
    // sleep would be deterministic in outcome but still timing-coupled)
    backdateWriterLease(spark, lake, ageMs = 10L)
    rec("ttl_takeover",
      granted(acquireWriterLease(spark, lake, "writer-c", ttlMs = 1L)))
    releaseWriterLease(spark, lake, "writer-c")
    // pre-commit recheck: a holder whose lease was taken over mid-body
    // (a TTL overrun) must ABORT before its manifest write
    val aborted = withOpLease(spark, lake, "leaseTwin",
        stableOwner = Some("writer-d")) { (recheck, _) =>
      releaseWriterLease(spark, lake, "writer-d")
      acquireWriterLease(spark, lake, "writer-e")
      try { recheck(); "committed" }
      catch { case _: IllegalStateException => "aborted" }
    }
    rec("recheck_after_takeover", aborted)
    releaseWriterLease(spark, lake, "writer-e")
    steps.toSeq.toDF("step", "action", "outcome").orderBy("step")
  }

  // ------------- run delivery (deterministic shard export + integrity)

  /** Deterministic shard manifest of a (doc_id, text) snapshot — the
    * delivery contract a pinned run ships with: shard =
    * hash60(doc_id) mod nShards (hash-balanced for ANY id distribution,
    * stable under content edits), per-shard doc/token/char totals plus an
    * ORDER-INDEPENDENT content checksum: bit_xor of
    * hash60(doc_id || '|' || text) over the shard's docs. XOR is the
    * right fold at scale — overflow-free, commutative (shard files can be
    * written in any partition order), and any single-doc corruption,
    * loss, or duplication flips it. One projection + one partial-
    * aggregated groupBy; output is O(nShards) rows. */
  def shardManifest(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    shardAggs(docs.withColumn("shard", shardOf(nShards)))
  }

  /** THE shard-assignment expression — hash60(doc_id) mod nShards. One
    * definition: the full export, the delta export, and the split-family
    * manifests ([[graft.operators.Sampling.splitShardManifest]]) must
    * agree on it or a consumer's verify would name phantom mismatches. */
  private[operators] def shardOf(nShards: Int): Column =
    pmod(graft.functions.Text.hash60(col("doc_id").cast("string")),
      lit(nShards.toLong)).cast("int")

  /** The shared per-shard aggregate over rows that already carry `shard`
    * (plus any extra grouping keys, e.g. the split family's `split`) —
    * THE delivery-integrity convention: doc/token/char totals and the
    * order-independent `bit_xor(hash60(doc_id || '|' || text))` checksum.
    * Every manifest a consumer verifies against delegates here, so the
    * checksum formula exists exactly once. */
  private[operators] def shardAggs(rows: DataFrame,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = extraKeys :+ "shard"
    rows.select(keys.map(col) ++ Seq(
        size(tokens(col("text"))).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("nc"),
        graft.functions.Text.hash60(concat(col("doc_id").cast("string"),
          lit("|"), col("text"))).as("h")): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("nc")).as("n_chars"), expr("bit_xor(h)").as("checksum"))
  }

  /** Export a pinned training run as deterministic shards: the run's
    * snapshot lands under `outDir/data` partitioned by shard, and its
    * [[shardManifest]] under `outDir/manifest` — the handoff artifact a
    * training job consumes and [[verifyRunShards]] re-checks at the far
    * end. `errorifexists` on both writes: an export is immutable like the
    * run it ships. Returns the manifest. */
  def exportRunShards(spark: SparkSession, dir: String, corpusDir: String,
      tag: String, nShards: Int, outDir: String): DataFrame = {
    val docs = readRunCorpus(spark, dir, corpusDir, tag)
      .select(col("doc_id"), col("text"))
    val sharded = docs.withColumn("shard", shardOf(nShards))
    sharded.repartition(col("shard"))
      .write.mode("errorifexists").partitionBy("shard")
      .parquet(s"$outDir/data")
    shardManifest(docs, nShards)
      .coalesce(1).write.mode("errorifexists").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /** Incremental run delivery — the DATA half of [[shardManifestDelta]]:
    * between two pinned runs, ship ONLY the changed docs (upserts with
    * their text, deletions as tombstone rows) partitioned by the same
    * hash shards as the full export, plus the ADVANCED manifest of the
    * full `toTag` snapshot. A consumer holding the `fromTag` export
    * applies the delta with [[applyRunDelta]] and re-verifies against
    * the shipped checksums — a lost, corrupted, or duplicated delta row
    * names its shard, the same contract as a full export. Cost: the
    * snapshot diff plus changed-doc writes — O(changes), never a corpus
    * re-export. `errorifexists` on both writes: a shipped delta is
    * immutable like the runs it joins. Returns the advanced manifest. */
  def exportRunDelta(spark: SparkSession, dir: String, corpusDir: String,
      fromTag: String, toTag: String, nShards: Int,
      outDir: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val v1 = readRunCorpus(spark, dir, corpusDir, fromTag)
      .select(col("doc_id"), col("text"))
    val v2 = readRunCorpus(spark, dir, corpusDir, toTag)
      .select(col("doc_id"), col("text"))
    val diff = snapshotDiff(v1, v2)
    val upserts = v2.join(diff
        .filter(col("change_type").isin("insert", "update"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .withColumn("_delta_deleted", lit(false))
    val deletes = diff.filter(col("change_type") === "delete")
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit(true).as("_delta_deleted"))
    val rows = upserts.unionByName(deletes)
      .withColumn("shard", shardOf(nShards))
    rows.repartition(col("shard"))
      .write.mode("errorifexists").partitionBy("shard")
      .parquet(s"$outDir/data")
    shardManifestDelta(shardManifest(v1, nShards), v1, v2, nShards)
      .coalesce(1).write.mode("errorifexists").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /** Consumer side of [[exportRunDelta]]: apply a delta export onto a
    * full export's data — delta rows replace base rows by doc_id,
    * tombstones drop them — writing the advanced snapshot (and its
    * shipped manifest) to `outDir`, then re-verify every shard's totals
    * and checksum from the APPLIED data. Returns [[verifyRunShards]]'s
    * mismatch frame over the result: empty means the delivery chain
    * (base export + delta) reconstructed the new run bit-intact; any
    * loss or corruption in EITHER artifact names its shard. The apply is
    * one anti-join + union per shard — no corpus-sized shuffle beyond
    * the base rewrite the consumer is performing anyway. */
  def applyRunDelta(spark: SparkSession, baseDir: String, deltaDir: String,
      outDir: String): DataFrame = {
    val base = spark.read.parquet(s"$baseDir/data")
      .select(col("doc_id"), col("text"), col("shard").cast("int").as("shard"))
    val delta = spark.read.parquet(s"$deltaDir/data")
      .select(col("doc_id"), col("text"),
        col("shard").cast("int").as("shard"),
        coalesce(col("_delta_deleted"), lit(false)).as("_delta_deleted"))
    val merged = base
      .join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(delta.filter(!col("_delta_deleted"))
        .drop("_delta_deleted"))
    merged.repartition(col("shard"))
      .write.mode("errorifexists").partitionBy("shard")
      .parquet(s"$outDir/data")
    spark.read.parquet(s"$deltaDir/manifest")
      .coalesce(1).write.mode("errorifexists").parquet(s"$outDir/manifest")
    verifyRunShards(spark, outDir)
  }

  /** Integrity check at the consumer end of a shard export: recompute
    * every shard's totals and checksum from the shipped data files and
    * full-outer-compare against the shipped manifest. Returns the
    * MISMATCHED shards — (shard, expected_*, actual_*) — empty means the
    * delivery is bit-intact; a lost/corrupted/duplicated doc names its
    * shard. Cost: one scan of the shipped data. */
  def verifyRunShards(spark: SparkSession, outDir: String): DataFrame = {
    val stored = spark.read.parquet(s"$outDir/manifest")
      .select(col("shard"), col("n_docs").as("expected_docs"),
        col("n_tokens").as("expected_tokens"),
        col("n_chars").as("expected_chars"),
        col("checksum").as("expected_checksum"))
    val actual = shardAggs(spark.read.parquet(s"$outDir/data")
        .select(col("doc_id"), col("text"), col("shard").cast("int").as("shard")))
      .select(col("shard"), col("n_docs").as("actual_docs"),
        col("n_tokens").as("actual_tokens"),
        col("n_chars").as("actual_chars"),
        col("checksum").as("actual_checksum"))
    stored.join(actual, Seq("shard"), "full_outer")
      .filter(!(col("expected_docs") <=> col("actual_docs")) ||
        !(col("expected_tokens") <=> col("actual_tokens")) ||
        !(col("expected_chars") <=> col("actual_chars")) ||
        !(col("expected_checksum") <=> col("actual_checksum")))
  }

  /** [[shardManifest]]'s oracled BATCH twin: the documents table sharded
    * 8 ways — DuckDB re-derives the md5-based shard assignment, the
    * totals, and the XOR checksums exactly. */
  def shardManifestTwin(spark: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")), 8)
      .orderBy(col("shard"))

  /** Advance a shard manifest across a snapshot diff incrementally — the
    * run-delivery DELTA path: between two pinned runs, ship only the
    * changed docs' shards plus this manifest; never rescan the corpus.
    * The XOR checksum is what makes the incremental step exact: XOR is
    * its own inverse, so removing a doc XORs its old hash back OUT and
    * adding one XORs its hash in —
    * `checksum' = checksum ⊕ xor(old hashes of updated/deleted docs)
    * ⊕ xor(new hashes of inserted/updated docs)` — while the doc/token/
    * char counters adjust by signed deltas. Cost: the [[snapshotDiff]]
    * (hashes only through its join) plus one signed aggregate over the
    * CHANGED docs — O(changes) at any corpus size; the consumer-side
    * [[verifyRunShards]] contract is unchanged because the advanced
    * manifest is value-identical to a from-scratch [[shardManifest]] of
    * the new snapshot (the `corpus_run_shards_delta` oracle pins this). */
  def shardManifestDelta(oldManifest: DataFrame, oldDocs: DataFrame,
      newDocs: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val diff = snapshotDiff(oldDocs, newDocs)
    val removed = oldDocs.join(diff
        .filter(col("change_type").isin("update", "delete"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val added = newDocs.join(diff
        .filter(col("change_type").isin("insert", "update"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val delta = shardSigned(removed, -1, nShards)
      .unionByName(shardSigned(added, 1, nShards))
      .groupBy(col("shard"))
      .agg(sum(col("sd")).as("d_docs"), sum(col("dt")).as("d_tokens"),
        sum(col("dc")).as("d_chars"), expr("bit_xor(h)").as("d_checksum"))
    oldManifest.join(delta, Seq("shard"), "full_outer")
      .select(col("shard"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)) +
          coalesce(col("d_tokens"), lit(0L))).as("n_tokens"),
        (coalesce(col("n_chars"), lit(0L)) +
          coalesce(col("d_chars"), lit(0L))).as("n_chars"),
        coalesce(col("checksum"), lit(0L))
          .bitwiseXOR(coalesce(col("d_checksum"), lit(0L))).as("checksum"))
      .filter(col("n_docs") > 0)
  }

  /** Per-doc signed shard contribution rows for [[shardManifestDelta]]:
    * counters carry the sign; the content hash does not (XOR needs the
    * raw hash on both the add and remove side). */
  private def shardSigned(docs: DataFrame, sign: Int,
      nShards: Int): DataFrame =
    docs.select(
      pmod(graft.functions.Text.hash60(col("doc_id").cast("string")),
        lit(nShards.toLong)).cast("int").as("shard"),
      lit(sign.toLong).as("sd"),
      (size(tokens(col("text"))).cast("long") * sign).as("dt"),
      (length(col("text")).cast("long") * sign).as("dc"),
      graft.functions.Text.hash60(concat(col("doc_id").cast("string"),
        lit("|"), col("text"))).as("h"))

  /** [[shardManifestDelta]]'s oracled BATCH twin: v1's manifest advanced
    * across the v1→v2 twin diff (inserts, updates, AND deletes) while
    * DuckDB computes v2's manifest from scratch — hash equality pins the
    * signed-counter/XOR algebra end to end. */
  def shardDeltaTwin(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = twinSnapshots(spark, dir)
    shardManifestDelta(shardManifest(v1, 8), v1, v2, 8)
      .orderBy(col("shard"))
  }

  /** Vacuum the lake: drop (a) dead orphan rows — epochs no manifest row
    * committed AND at-or-below the committed head, which can never commit
    * (the stream's epoch counter is monotone and the collision guard
    * skips re-delivery); uncommitted rows ABOVE the head are kept, since
    * they may be an in-flight epoch whose manifest row is about to land
    * (so a crash-recovering stream finds its data intact). Vacuum still
    * rewrites the docs dir wholesale — an append landing INSIDE the
    * read-to-swap window would be lost — so run it from the maintenance
    * cadence (between batches) or while ingest is quiesced, like every
    * other whole-artifact rewrite here — and (b) doc versions superseded
    * at or below `retainFrom`,
    * keeping exactly the rows some still-pinnable version can serve:
    * every committed row with epoch > retainFrom plus the latest
    * committed row ≤ retainFrom per doc_id (the visible-at-floor state).
    * The manifest keeps every row — the commit history is the audit trail
    * and costs one row per epoch. The rewrite also coalesces the many
    * small per-epoch append files — vacuum doubles as the lake's
    * file-count hygiene pass. Vacuum is also the PURGE half of
    * [[deleteDocs]]: a tombstone hides a doc immediately, but its
    * superseded text rows survive until the floor rises past them — a
    * vacuum at or above the delete version keeps only the (text-less)
    * tombstone as the doc's floor state, physically reclaiming the bytes
    * (the right-to-be-forgotten completion).
    *
    * Write ordering is the conservative direction: the retention marker
    * lands FIRST (tmp-swap), so a crash mid-vacuum refuses pre-floor pins
    * while the data is still intact — never the reverse, where a pinned
    * read between the floor and the old horizon would silently serve
    * collapsed history. The docs/decisions rewrites then go through the
    * same `_compacting`-swap protocol as index compaction, recovered by
    * [[Similarity.resolveArtifact]] on every read path. Floors only move
    * up (enforced), for the same reason.
    *
    * With `versioned = true` the kept rows land in a NEW store
    * generation and the `store_head` pointer flips (the
    * [[optimizeCorpusVersioned]] no-retry convention) instead of the
    * in-place swap — in-flight cross-session scans finish on the old
    * generation, and [[reclaimStoreGenerations]] reclaims it after the
    * drain window.
    *
    * Returns (docs rows before, docs rows after). */
  def vacuumCorpus(spark: SparkSession, corpusDir: String,
      retainFrom: Long, versioned: Boolean = false): (Long, Long) = {
    import spark.implicits._
    // a branch shares its pre-base history with the parent — collapsing
    // it here would rewrite the LOCAL store with parent rows folded in
    // (silently materializing the zero-copy clone) while the parent
    // keeps serving the originals. Vacuum the parent; drop the branch.
    require(parentOf(spark, corpusDir).isEmpty,
      s"$corpusDir is a branch: vacuum applies to the parent lake " +
        "(drop the branch to release its pin first)")
    val prevFloor = retentionFloor(spark, corpusDir)
    require(retainFrom >= prevFloor,
      s"retention floor may only rise (current $prevFloor, got $retainFrom)")
    // refuse an overshot floor BEFORE the marker lands: floors are
    // irreversible, so a typo'd retainFrom past the head would otherwise
    // permanently refuse every pin, change feed, and pinRun on a lake
    // whose data is actually intact
    val committedHead = manifest(spark, corpusDir).agg(max(col("version")))
      .as[Option[Long]].head().getOrElse(Long.MinValue)
    require(retainFrom <= committedHead,
      s"retainFrom $retainFrom exceeds the committed head $committedHead: " +
        "refusing to raise the retention floor past versions that exist")
    // pinned training runs are reproducibility contracts: refuse to
    // collapse history any of them still serves
    val pinnedBelow = {
      import spark.implicits._
      pinnedRuns(spark, corpusDir).filter(col("version") < retainFrom)
        .select(col("tag"), col("version")).as[(String, Long)].collect()
    }
    require(pinnedBelow.isEmpty,
      s"vacuum to $retainFrom would invalidate pinned run(s) " +
        pinnedBelow.map { case (t, v) => s"$t@$v" }.mkString(", ") +
        " — unpin them first")
    Seq(retainFrom).toDF("min_version")
      .write.mode("overwrite").parquet(s"$corpusDir/retention_compacting")
    Similarity.swapArtifact(spark, corpusDir, "retention")
    val manDf = manifest(spark, corpusDir)
    val head = {
      import spark.implicits._
      manDf.agg(max(col("version"))).as[Option[Long]].head()
        .getOrElse(Long.MinValue)
    }
    val raw = admittedRaw(spark, corpusDir)
    val before = raw.count()
    // pair-aware (epoch, commit_tag) membership, keepTag: the rewrite
    // must preserve each kept row's writer tag or the next vacuum/read
    // would lose the adoption exclusion for surviving history
    val committed = committedRows(raw, manDf, keepTag = true)
    val recent = committed.filter(col("epoch") > retainFrom)
    val floorState = committed.filter(col("epoch") <= retainFrom)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch").desc)))
      .filter(col("_rn") === 1).drop("_rn")
    // uncommitted rows ABOVE the committed head may be a live stream's
    // in-flight epoch (data lands before the manifest row — deleting it
    // here would let the imminent manifest commit an emptied epoch);
    // uncommitted rows AT or BELOW head are provably dead — the stream's
    // epoch counter is monotone and the committed-collision guard skips
    // re-delivery — and only those are reclaimed. Pair-aware: a
    // taken-over writer's rows at a version a NEW holder committed are
    // uncommitted BY TAG even though the epoch has a manifest row —
    // exactly the orphans this cleanup exists to reclaim.
    val inFlight = uncommittedRows(raw, manDf)
      .filter(col("epoch") > head)
    // `versioned` = the no-retry write path: kept rows land in a NEW
    // generation dir and the pointer flips (the optimizeCorpusVersioned
    // convention) — a cross-session scan planned pre-vacuum finishes on
    // the old generation; reclaim is explicit. The in-place swap remains
    // the zero-dir-growth default.
    val flips = Seq.newBuilder[(String, Long)]
    def rewrite(name: String, rows: DataFrame): String =
      if (!versioned) {
        val cur = storeName(spark, corpusDir, name)
        rows.write.mode("overwrite").parquet(s"$corpusDir/${cur}_compacting")
        Similarity.swapArtifact(spark, corpusDir, cur)
        s"$corpusDir/$cur"
      } else {
        val g = storeGen(spark, corpusDir, name) + 1
        rows.write.mode("overwrite").parquet(s"$corpusDir/${name}_gen_$g")
        flips += name -> g
        s"$corpusDir/${name}_gen_$g"
      }
    val kept = recent.unionByName(floorState).unionByName(inFlight)
    val newDocs = rewrite("docs", kept)
    val decStore = storeName(spark, corpusDir, "decisions")
    val decPath = Similarity.resolveArtifact(spark, corpusDir, decStore)
    if (graft.sources.Formats.pathExists(spark, decPath)) {
      val dec0 = readStore(spark, corpusDir, "decisions").get
      val dec = dec0.dropDuplicates(replayKey(dec0))
      rewrite("decisions", committedRows(dec, manDf, keepTag = true)
        .unionByName(uncommittedRows(dec, manDf)
          .filter(col("epoch") > head)))
    }
    flipStoreHead(spark, corpusDir, flips.result())
    val after = spark.read.option("recursiveFileLookup", "true")
      .parquet(newDocs).count()
    (before, after)
  }

  /** Parquet data-file count under a store dir, RECURSIVE (a store may
    * hold flat appends, a `live/` sub-store, and `packed_*` segments) —
    * the quantity OPTIMIZE exists to bound. Zero for a missing dir. */
  private[graft] def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext)
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Write-time schema validation for an evolved append (the table-format
    * rule): an incompatibly-typed carry column must refuse BEFORE any
    * file lands — one bad append would otherwise poison every later
    * mergeSchema read of the lake, with no repair API and the bad files
    * already committed. New columns are fine (that is the evolution);
    * only a name present in both with a different type refuses.
    * Footer-read cost is file-count-proportional, which
    * [[optimizeCorpus]] bounds. */
  private[graft] def validateCarrySchema(spark: SparkSession,
      corpusDir: String, rows: DataFrame, store: String = "docs"): Unit = {
    val stored = readStore(spark, corpusDir, store)
      .fold(Map.empty[String, org.apache.spark.sql.types.DataType])(
        _.schema.map(f => f.name -> f.dataType).toMap)
    rows.schema.foreach { f =>
      stored.get(f.name).foreach(t => require(t == f.dataType,
        s"schema evolution type conflict on '$store.${f.name}': the store " +
          s"holds $t, the batch carries ${f.dataType} — refusing the append"))
    }
  }

  /** Operational stats for a lake — the DESCRIBE surface an operator
    * watches to schedule maintenance: one row per concern. `file_count`
    * rising against flat `row_count` says OPTIMIZE is due;
    * `uncommitted_epochs` > 0 names in-flight (or crash-orphaned) data;
    * `committed_epochs` vs `retention_floor` bounds the time-travel
    * window; `pinned_runs` is the vacuum constraint. Cost: file listings
    * plus one count per store and the (KB-scale) manifest/pins/retention
    * reads — no corpus-sized shuffle; safe to poll. */
  def lakeStats(spark: SparkSession, corpusDir: String): DataFrame = {
    import spark.implicits._
    val man = manifest(spark, corpusDir)
    val committedN = man.count()
    val head = man.agg(max(col("version"))).as[Option[Long]].head()
    def store(name: String): (Long, Long) = readStore(spark, corpusDir, name)
      .fold((0L, 0L))(df => (df.count(),
        dataFileCount(spark, Similarity.resolveArtifact(spark, corpusDir,
          storeName(spark, corpusDir, name)))))
    val (docRows, docFiles) = store("docs")
    val (decRows, decFiles) = store("decisions")
    // union BOTH stores' epochs: a batch whose every arrival was rejected
    // leaves its crash orphan only in decisions (zero docs rows) — the
    // DESCRIBE surface must agree with vacuum about what exists.
    // Pair-aware like vacuum's reclaim: an epoch counts as carrying
    // uncommitted data when ANY of its rows fails the (epoch, commit_tag)
    // test — including a taken-over writer's orphans at a version a new
    // holder committed, which the epoch-only anti-join would hide.
    val uncommitted = Seq("docs", "decisions").map { name =>
      readStore(spark, corpusDir, name)
        .map { df =>
          val cols = col("epoch") +:
            (if (df.columns.contains("_commit")) Seq(col("_commit"))
             else Nil)
          uncommittedRows(df.select(cols: _*).distinct(), man)
            .select(col("epoch"))
        }
        .getOrElse(spark.range(0).select(col("id").as("epoch")))
    }.reduce(_ unionByName _).distinct().count()
    val floor = retentionFloor(spark, corpusDir)
    val pins = pinnedRuns(spark, corpusDir).count()
    // raw tombstone rows ([[deleteDocs]]), not currently-deleted docs —
    // the latter needs a corpus-sized latest-wins window, and this surface
    // stays poll-cheap by contract
    val tombstones = readStore(spark, corpusDir, "docs").fold(0L) { df =>
      if (!df.columns.contains("_deleted")) 0L
      else df.filter(coalesce(col("_deleted"), lit(false))).count()
    }
    // expectation-violation total from the manifest audit (KB-scale read;
    // the column evolved in, so pre-expectations lakes read 0)
    val invalidRows =
      if (!man.columns.contains("n_invalid")) 0L
      else man.agg(coalesce(sum(coalesce(col("n_invalid"), lit(0L))),
        lit(0L))).as[Long].head()
    // generation visibility: the current pointer generation per store and
    // the superseded dirs still on disk (the reclaim backlog a versioned
    // rewrite leaves for the drain-window pass) — dir listings only
    val docsGen = storeGen(spark, corpusDir, "docs")
    val decGen = storeGen(spark, corpusDir, "decisions")
    val manGen = storeGen(spark, corpusDir, "manifest")
    // the commit-listing backlog: one file per commit until compactManifest
    // rewrites the history — rising against flat committed_epochs after a
    // compaction says the next one is due
    val manFiles = {
      val p = manifestTarget(spark, corpusDir)
      if (!graft.sources.Formats.pathExists(spark, p)) 0L
      else dataFileCount(spark, p)
    }
    val staleGens = {
      val root = new org.apache.hadoop.fs.Path(corpusDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      Seq("docs" -> docsGen, "decisions" -> decGen, "manifest" -> manGen)
        .map { case (name, cur) =>
        if (cur == 0L) 0L
        else {
          val legacy =
            if (fs.exists(new org.apache.hadoop.fs.Path(s"$corpusDir/$name")))
              1L else 0L
          legacy + (0L until cur).count(g => fs.exists(
            new org.apache.hadoop.fs.Path(s"$corpusDir/${name}_gen_$g"))).toLong
        }
      }.sum
    }
    // session-3 surfaces, all KB-scale artifact reads: zone-map coverage
    // (profiled vs live files — a gap says a collect is due), branch
    // facts (is this dir a branch; how many live branches hold pins on
    // it), and the replication cursor when this dir is a follower
    val zoneFiles = {
      val p = Similarity.resolveArtifact(spark, corpusDir, "file_stats")
      if (!graft.sources.Formats.pathExists(spark, p)) -1L
      else spark.read.parquet(p).count()
    }
    val branchBase = parentOf(spark, corpusDir).map(_._2)
    val liveBranches = branches(spark, corpusDir).count()
    val replicaCursor = {
      val p = Similarity.resolveArtifact(spark, corpusDir, "replica_cursor")
      if (!graft.sources.Formats.pathExists(spark, p)) -1L
      else cursorValue(spark, p)
    }
    Seq(
      ("committed_epochs", committedN),
      ("committed_head", head.getOrElse(-1L)),
      ("uncommitted_epochs", uncommitted),
      ("docs_rows", docRows), ("docs_files", docFiles),
      ("decisions_rows", decRows), ("decisions_files", decFiles),
      ("retention_floor", if (floor == Long.MinValue) -1L else floor),
      ("pinned_runs", pins),
      ("tombstone_rows", tombstones),
      ("invalid_rows", invalidRows),
      ("store_generation", math.max(docsGen, decGen)),
      ("manifest_files", manFiles),
      ("manifest_generation", manGen),
      ("stale_generation_dirs", staleGens),
      ("zone_mapped_files", zoneFiles),
      ("is_branch_of_version", branchBase.getOrElse(-1L)),
      ("live_branches", liveBranches),
      ("replica_cursor", replicaCursor)
    ).toDF("stat", "value")
  }

  /** Serving-freshness DESCRIBE: how far each lake-fed consumer's cursor
    * trails the committed head — the staleness an operator alerts on
    * before a lagging index quietly serves old retrieval. One row per
    * consumer: (consumer, cursor_version, head_version, lag_commits),
    * where lag is the COUNT of committed versions past the cursor
    * (versions are monotone but not dense, so head − cursor would lie).
    * A consumer that has never refreshed reports cursor −1 with the full
    * commit count as its lag. Cost: the KB-scale cursor artifacts plus
    * one manifest count per leg — poll-cheap like [[lakeStats]]. */
  def refreshLag(spark: SparkSession, corpusDir: String,
      maintDir: Option[String] = None,
      profDir: Option[String] = None,
      viewDirs: Seq[String] = Nil,
      replicaDirs: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val man = manifest(spark, corpusDir)
    val head = man.agg(max($"version")).as[Option[Long]].head().getOrElse(-1L)
    def cursor(dir: String, name: String): Long = {
      val p = Similarity.resolveArtifact(spark, dir, name)
      if (!graft.sources.Formats.pathExists(spark, p)) Long.MinValue
      else cursorValue(spark, p)
    }
    def leaf(d: String): String = d.split('/').filter(_.nonEmpty).last
    val legs =
      maintDir.toSeq.flatMap(m => Seq(
        "postings" -> cursor(m, "lake_cursor"),
        "dense" -> cursor(m, "dense_lake_cursor"))) ++
      profDir.toSeq.map(p => "profile" -> cursor(p, "cursor")) ++
      viewDirs.map(v => s"view:${leaf(v)}" -> cursor(v, "cursor")) ++
      replicaDirs.map(r =>
        s"replica:${leaf(r)}" -> cursor(r, "replica_cursor"))
    legs.map { case (name, c) =>
      val lag = man.filter($"version" > c).count()
      (name, if (c == Long.MinValue) -1L else c, head, lag)
    }.toDF("consumer", "cursor_version", "head_version", "lag_commits")
  }

  /** Append target inside a store: the `live/` sub-store the incremental
    * OPTIMIZE packs. Resolves interrupted swaps at BOTH levels — a full
    * rewrite/vacuum swaps the store itself; a pack truncation swaps
    * `live` — so an append can never strand a completed rewrite of
    * either. */
  private def liveTarget(spark: SparkSession, corpusDir: String,
      name: String): String = {
    val store = Similarity.resolveArtifact(spark, corpusDir,
      storeName(spark, corpusDir, name))
    Similarity.resolveArtifact(spark, store, "live")
  }

  /** Incremental OPTIMIZE — the O(new data) hygiene pass the inline
    * cadence runs. The maintenance loop appends into `<store>/live/`;
    * each pass reads ONLY that live window (never the lake), packs it
    * into one sorted `packed_<maxEpoch>` segment, then truncates live
    * bounded by the fold watermark ([[Similarity.truncateStoreThrough]]:
    * rows a crash-replay lands after the read survive). Crash at any
    * point is serve-consistent: segment-before-truncate means the packed
    * rows briefly coexist with their live originals — byte-identical,
    * collapsed by every reader's (key, epoch) dedup, the same state an
    * epoch replay creates — and a re-run rewrites the same segment name
    * with the same bytes. File count after k firings is O(k) segments
    * (each internally size-targeted and (epoch, doc_id)-sorted, so
    * row-group epoch pruning holds per segment), against O(commits)
    * before; the standalone [[optimizeCorpus]] deep pass merges segments
    * back to O(rows/target) when scheduled. Returns (rows packed, live
    * data files reclaimed). */
  def optimizeCorpusIncremental(spark: SparkSession, corpusDir: String,
      targetRowsPerFile: Long = 1L << 20): (Long, Long) = {
    import spark.implicits._
    var (packed, reclaimed) = (0L, 0L)
    for (name <- Seq("docs", "decisions")) {
      val store = Similarity.resolveArtifact(spark, corpusDir,
        storeName(spark, corpusDir, name))
      val live = Similarity.resolveArtifact(spark, store, "live")
      if (graft.sources.Formats.pathExists(spark, live)) {
        val filesBefore = dataFileCount(spark, live)
        val raw = spark.read.option("mergeSchema", "true").parquet(live)
        val foldedThrough =
          if (raw.columns.contains("epoch"))
            raw.agg(max(col("epoch"))).as[Option[Long]].head()
          else None
        val rows = raw.dropDuplicates(replayKey(raw)).persist()
        try {
          val n = rows.count()
          if (n > 0) {
            val nFiles = math.max(1L,
              (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
            rows.repartitionByRange(nFiles, col("epoch"), col("doc_id"))
              .sortWithinPartitions(col("epoch"), col("doc_id"))
              .write.mode("overwrite")
              .parquet(s"$store/packed_${foldedThrough.getOrElse(0L)}")
            Similarity.truncateStoreThrough(spark, live, foldedThrough)
            packed += n
            reclaimed += filesBefore
          }
        } finally rows.unpersist()
      }
    }
    (packed, reclaimed)
  }

  /** OPTIMIZE: physical small-file compaction of the lake's append
    * stores. Every committed epoch appends its own parquet file set, so a
    * long-running ingest accumulates file counts linear in commits — at
    * 100 TB that is the classic lake killer (per-file open cost dominates
    * the scan; the driver's file listing alone becomes the bottleneck).
    * This job rewrites `docs` and `decisions` into
    * `ceil(rows / targetRowsPerFile)` size-targeted files and nothing
    * else: every (doc_id, epoch) row survives verbatim (byte-identical
    * replay copies collapse — the same collapse every reader already
    * applies), so time travel, the change feed, pinned runs, and the
    * admission log are result-identical before and after. Unlike
    * [[vacuumCorpus]] it never collapses history and needs no floor.
    *
    * This is the DEEP pass: O(lake) per run, scheduled like vacuum (it
    * also merges [[optimizeCorpusIncremental]]'s packed segments and
    * physically unifies an evolved store's schema). The recurring
    * hygiene on the ingest cadence is the incremental pass — O(new
    * data), never the lake.
    *
    * Layout: rows are range-partitioned on (epoch, doc_id) and sorted
    * within files, so each output file covers a tight, near-disjoint
    * epoch range — parquet min/max footer stats keep
    * [[readCorpusChanges]]' `epoch > from` predicate a whole-file skip
    * even after coalescing (the property the per-epoch append layout gave
    * for free, preserved deliberately).
    *
    * Crash safety: the rewrite lands in `*_compacting` and swaps in
    * ([[Similarity.swapArtifact]]); every reader and appender resolves an
    * interrupted swap ([[Similarity.resolveArtifact]] /
    * `Similarity.appendTarget`). Like vacuum's wholesale rewrite, an
    * append landing DURING the rewrite window would be lost — run on the
    * maintenance cadence, between batches (the documented quiescence every
    * whole-artifact rewrite here assumes).
    *
    * Returns (data files before, data files after) across both stores. */
  def optimizeCorpus(spark: SparkSession, corpusDir: String,
      targetRowsPerFile: Long = 1L << 20): (Long, Long) = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive")
    var (before, after) = (0L, 0L)
    for (name <- Seq("docs", "decisions")) {
      val cur = storeName(spark, corpusDir, name)
      val p = Similarity.resolveArtifact(spark, corpusDir, cur)
      if (graft.sources.Formats.pathExists(spark, p)) {
        before += dataFileCount(spark, p)
        // replay-collapse key includes the writer tag when present: the
        // deep rewrite must not collapse an orphaned zombie row and a
        // committed row at one (doc_id, epoch) into an arbitrary survivor
        val keys = readStore(spark, corpusDir, name)
          .map(replayKey).getOrElse(Seq("doc_id", "epoch"))
        Similarity.coalesceStore(spark, s"$corpusDir/$cur",
          keys, Seq("epoch", "doc_id"), targetRowsPerFile)
        after += dataFileCount(spark, s"$corpusDir/$cur")
      }
    }
    (before, after)
  }

  /** [[optimizeCorpus]]' oracled BATCH twin: build a deterministic
    * three-epoch lake beside the fixture (epoch 0 = every doc; epoch 1 =
    * an LWW update of every doc_id ≡ 3 (mod 7); epoch 2 = an UNCOMMITTED
    * partial epoch — data landed, no manifest row), each epoch written as
    * many small files plus a byte-identical replay of epoch 1, then
    * OPTIMIZE, then serve the head snapshot. DuckDB recomputes the head
    * directly from the documents table, so the hash gate pins that a
    * physical rewrite changed NOTHING: LWW winners intact, the replay
    * collapsed once not twice, the uncommitted epoch still invisible. The
    * file-count assertion makes the query fail loudly if OPTIMIZE ever
    * stops compacting. Lake build + optimize run once per fixture dir
    * (memoized); the serve re-reads the optimized store every call. */
  def optimizeTwin(spark: SparkSession, dir: String): DataFrame = {
    val corpusDir = optLakeDir(spark, dir)
    readCorpusAt(spark, dir, corpusDir, None)
      .orderBy(col("doc_id"))
  }

  /** [[optimizeTwin]]'s memoized lake build (bench fixture-charging
    * hook target — see [[warmTwinFixtures]]). */
  private def optLakeDir(spark: SparkSession, dir: String): String =
    graft.sources.Caches.memoizedValue[String](spark,
        s"corpus-opt-lake|$dir") {
      val d = java.nio.file.Files.createTempDirectory("graft-opt-lake")
        .toString + "/corpus"
      val docs = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text"))
      docs.select(col("doc_id"), col("text"), lit(0L).as("epoch"))
        .repartition(8).write.mode("append").parquet(s"$d/docs")
      val upd = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), concat(col("text"), lit(" u1")).as("text"),
          lit(1L).as("epoch"))
      upd.repartition(8).write.mode("append").parquet(s"$d/docs")
      // a crash-replayed epoch: byte-identical copy of epoch 1's rows
      upd.repartition(8).write.mode("append").parquet(s"$d/docs")
      // an in-flight epoch above the head: data first, manifest never
      docs.filter(col("doc_id") % 11 === 5)
        .select(col("doc_id"), concat(col("text"), lit(" u2")).as("text"),
          lit(2L).as("epoch"))
        .repartition(8).write.mode("append").parquet(s"$d/docs")
      import spark.implicits._
      Seq((0L, 0L, 0L, 0L, 0L, 0L), (1L, 0L, 0L, 0L, 0L, 0L))
        .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
          "n_contaminated", "n_low_quality")
        .write.mode("append").parquet(s"$d/manifest")
      val (fb, fa) = optimizeCorpus(spark, d)
      require(fa < fb,
        s"OPTIMIZE did not reduce the file count ($fb -> $fa)")
      d
    }

  /** The deterministic delete-lifecycle lake BOTH delete twins serve —
    * built ONCE per fixture dir through the REAL [[deleteDocs]] API:
    * epoch 0 commits an LWW update of every doc_id ≡ 1 (mod 10) (so the
    * deletes hit lake rows AND base-only rows), version 1 is a committed
    * [[deleteDocs]] of every doc_id ≡ 2 (mod 9), version 2 re-admits the
    * ≡ 2 (mod 27) subset with fresh text (deletes are reversible). The
    * allocated versions are asserted so the fixture fails loudly if
    * [[nextLakeVersion]] ever drifts. */
  private[graft] def deleteLake(spark: SparkSession,
      dir: String): String =
    graft.sources.Caches.memoizedValue[String](spark,
        s"corpus-del-lake|$dir") {
      import spark.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft-del-lake")
        .toString + "/corpus"
      val docs = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 10 === 1)
        .select(col("doc_id"), concat(col("text"), lit(" u1")).as("text"),
          lit(0L).as("epoch"))
        .write.mode("append").parquet(s"$d/docs")
      // pre-split manifest row (no batch_id): the delete path must
      // interoperate with a lake whose manifest predates the schema split
      Seq((0L, 0L, 0L, 0L, 0L, 0L))
        .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
          "n_contaminated", "n_low_quality")
        .write.mode("append").parquet(s"$d/manifest")
      val vDel = deleteDocs(spark, d,
        docs.filter(col("doc_id") % 9 === 2).select(col("doc_id")))
      require(vDel == 1L, s"delete committed at $vDel, expected 1")
      val vRe = nextLakeVersion(spark, d)
      require(vRe == 2L, s"re-admission allocated $vRe, expected 2")
      docs.filter(col("doc_id") % 27 === 2)
        .select(col("doc_id"), concat(col("text"), lit(" re")).as("text"),
          lit(vRe).as("epoch"))
        .write.mode("append").parquet(s"$d/docs")
      Seq((vRe, 0L, 0L, 0L, 0L, 0L))
        .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
          "n_contaminated", "n_low_quality")
        .write.mode("append").parquet(s"$d/manifest")
      d
    }

  /** [[deleteDocs]]' oracled BATCH twin, snapshot leg: serve the
    * [[deleteLake]] head. DuckDB recomputes the visible set directly from
    * the documents table — hash equality pins that a tombstone hides its
    * doc AND shadows its base row, that an un-deleted LWW update still
    * serves, and that a re-admission past the tombstone wins. */
  def deleteTwin(spark: SparkSession, dir: String): DataFrame =
    readCorpusAt(spark, dir, deleteLake(spark, dir), None)
      .orderBy(col("doc_id"))

  /** [[deleteDocs]]' oracled BATCH twin, change-feed leg: the CDC window
    * (0, head] over the [[deleteLake]] — exactly the rows every lake-fed
    * index refresher consumes. DuckDB re-derives the feed (deletes with
    * null text at the tombstone version; the re-admitted subset as
    * updates), pinning the retraction feed end-to-end. */
  def deleteFeedTwin(spark: SparkSession, dir: String): DataFrame =
    readCorpusChanges(spark, dir, deleteLake(spark, dir), 0L, None)
      .orderBy(col("doc_id"))

  /** [[readCorpusAtRange]]'s oracled twin: serve a doc_id range of the
    * [[deleteLake]] head THROUGH the zone-map data-skipping path —
    * [[collectFileStats]] runs first so the prune decision is real, over
    * a lake that exercises every snapshot semantic (LWW updates, a
    * tombstone epoch, re-admission past it). DuckDB recomputes the same
    * range directly from the documents table; hash equality pins that
    * file pruning changes NOTHING inside the range. */
  def prunedTwin(spark: SparkSession, dir: String): DataFrame = {
    val lake = deleteLake(spark, dir)
    // INCREMENTAL stats maintenance (O(files added), a no-op when the
    // zones already cover the live files) instead of the old
    // delete-and-rebuild-from-scratch per serve: re-profiling every live
    // file on every read is O(lake) work the zone-map design exists to
    // avoid, and the prune decision is equally real either way (the
    // stats rows are identical). First serve builds the full stats;
    // repeat serves pay only the freshness check.
    collectFileStatsIncremental(spark, lake)
    readCorpusAtRange(spark, dir, lake, 100L, 299L).orderBy(col("doc_id"))
  }

  /** Deterministic branch-lifecycle fixture for the branch twins: parent
    * lake (epoch 0 = " u1" updates of ids ≡1 mod 10) → REAL createBranch
    * at head → parent advances (epoch 1 = " p2" updates of ids ≡3 mod 8,
    * invisible to the branch) → branch commits its own update epoch
    * (" b1", ids ≡5 mod 6) and a REAL deleteDocs (ids ≡4 mod 7) → REAL
    * mergeBranch folds the branch's net effect into the parent as one
    * epoch. Returns (parentDir, branchDir). */
  private def branchLake(spark: SparkSession,
      dir: String): (String, String) =
    graft.sources.Caches.memoizedValue[(String, String)](spark,
        s"corpus-branch-lake|$dir") {
      import spark.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("graft-branch-lake").toString
      val (parent, branch) = (s"$root/parent", s"$root/exp1")
      val docs = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text"))
      def commit(corpusDir: String, v: Long): Unit =
        Seq((v, 0L, 0L, 0L, 0L, 0L))
          .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
            "n_contaminated", "n_low_quality")
          .write.mode("append").parquet(s"$corpusDir/manifest")
      docs.filter($"doc_id" % 10 === 1)
        .select($"doc_id", concat($"text", lit(" u1")).as("text"),
          lit(0L).as("epoch"))
        .write.mode("append").parquet(s"$parent/docs")
      commit(parent, 0L)
      val base = createBranch(spark, dir, parent, branch, "exp1")
      require(base == 0L, s"branched at $base, expected head 0")
      // the parent moves on AFTER the branch point — must stay invisible
      // to the branch, and lose LWW to the merge epoch for touched docs
      docs.filter($"doc_id" % 8 === 3)
        .select($"doc_id", concat($"text", lit(" p2")).as("text"),
          lit(1L).as("epoch"))
        .write.mode("append").parquet(s"$parent/docs")
      commit(parent, 1L)
      // branch-local ablation: an update epoch and a real takedown
      val vB = nextLakeVersion(spark, branch)
      require(vB == 1L, s"branch allocated $vB, expected base+1 = 1")
      docs.filter($"doc_id" % 6 === 5)
        .select($"doc_id", concat($"text", lit(" b1")).as("text"),
          lit(vB).as("epoch"))
        .write.mode("append").parquet(s"$branch/docs")
      commit(branch, vB)
      val vDel = deleteDocs(spark, branch,
        docs.filter($"doc_id" % 7 === 4).select($"doc_id"))
      require(vDel == 2L, s"branch delete committed at $vDel, expected 2")
      val vMerge = mergeBranch(spark, branch)
      require(vMerge == 2L, s"merge committed at $vMerge, expected 2")
      (parent, branch)
    }

  /** [[replicateLake]]'s oracled twin: a follower lake catches up to the
    * delete-lifecycle primary through the replication path (bootstrap
    * window over LWW update + tombstone + re-admission epochs), then
    * serves its own head. DuckDB recomputes the primary's visible set —
    * hash equality pins that the follower converges to it, retraction
    * included. */
  def replicaTwin(spark: SparkSession, dir: String): DataFrame =
    readCorpusAt(spark, dir, replicaLakeDir(spark, dir))
      .orderBy(col("doc_id"))

  /** [[replicaTwin]]'s memoized follower build (bench fixture hook). */
  private def replicaLakeDir(spark: SparkSession, dir: String): String = {
    val src = deleteLake(spark, dir)
    graft.sources.Caches.memoizedValue[String](spark,
        s"corpus-replica|$dir") {
      val d = java.nio.file.Files
        .createTempDirectory("graft-replica-lake").toString + "/replica"
      val win = replicateLake(spark, dir, src, d)
      require(win.contains((Long.MinValue, 2L)), s"bootstrap window: $win")
      d
    }
  }

  /** Bench fixture-charging hook for the remaining memoized lifecycle
    * twins (optimize / branch / replica lakes): pre-build them under one
    * timed `fixture:lifecycle_lakes` entry so their twins' bench numbers
    * measure serve cost only. The three builds are INDEPENDENT job
    * chains over their own temp lakes (the shared delete-lake dependency
    * is already memoized — the bench builds `fixture:delete_lake` first),
    * so they run from a small pool (guide §2.6): each build's wall is a
    * ladder of commit barriers (epoch writes, manifest appends, pointer
    * swaps) whose gaps the other builds' stages back-fill; per-build
    * work and produced stores are unchanged. */
  private[graft] def warmTwinFixtures(spark: SparkSession,
      dir: String): Unit = {
    val builds: Seq[() => Unit] = Seq(
      () => { optLakeDir(spark, dir); () },
      () => { branchLake(spark, dir); () },
      () => { replicaLakeDir(spark, dir); () })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(builds.size)
    try {
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      builds.map(b => scala.concurrent.Future(b())(ec))
        .foreach(f => scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }

  /** [[createBranch]]'s oracled twin, branch leg: the branch head after
    * the [[branchLake]] lifecycle. DuckDB recomputes the visible set —
    * hash equality pins snapshot isolation (the parent's post-branch
    * " p2" epoch absent), the overlay LWW (" b1" over " u1" over base),
    * and the branch-local tombstones hiding docs. */
  def branchTwin(spark: SparkSession, dir: String): DataFrame = {
    val (_, branch) = branchLake(spark, dir)
    readCorpusAt(spark, dir, branch).orderBy(col("doc_id"))
  }

  /** [[mergeBranch]]'s oracled twin, parent leg: the parent head after
    * the merge. DuckDB recomputes it — merge-wins over the parent's
    * concurrent " p2" epoch for every doc the branch touched (updates
    * AND deletes), parent-only updates preserved, untouched docs
    * unchanged. */
  def branchMergeTwin(spark: SparkSession, dir: String): DataFrame = {
    val (parent, _) = branchLake(spark, dir)
    readCorpusAt(spark, dir, parent).orderBy(col("doc_id"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.DataStreamWriter
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
  * epoch: the admission decision is idempotent by construction (the
  * batch's own rows are excluded from the index side, so the crashed
  * attempt's partial appends cannot flip a verdict), and the replayed
  * byte-identical rows collapse in the (doc_id, epoch) read dedup. This is
  * the transaction-log discipline a table format (Delta/Iceberg) provides,
  * built from the primitives the library already verifies — at 100 TB the
  * manifest is a few KB per epoch and every reader prunes to committed
  * epochs before touching data files.
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
    * dup leg = persisted index ∪ admitted-so-far delta store (batch's own
    * ids EXCLUDED from the existing side — replay idempotency) ∪ the
    * intra-batch first-wins leg; contamination + quality via
    * [[Curate.admitRows]]. `admittedDocs` is the lake's committed admitted
    * relation for candidate verification. */
  private[graft] def admitBatch(spark: SparkSession, dir: String,
      batch: DataFrame, indexDir: String, storeDir: Option[String],
      admittedDocs: Option[DataFrame], benchPost: DataFrame): DataFrame = {
    val vsIndex = Dedup.dedupArrivalsFromSaved(spark, dir, batch, indexDir,
        storeDir, admittedDocs)
      .join(batch.select(col("doc_id").as("existing_id")),
        Seq("existing_id"), "left_anti")
      .select(col("arriving_id"), col("existing_id"))
    val dupPairs = vsIndex.unionByName(
      intraBatchPairs(batch).select(col("arriving_id"), col("existing_id")))
    Curate.admitRows(batch, dupPairs, benchPost)
  }

  /** Replay-safe read of the lake's admitted docs: byte-identical replay
    * copies collapse on (doc_id, epoch); committed-epoch filtering is the
    * CALLER's job (pass through [[committedOnly]]). */
  private def admittedRaw(spark: SparkSession, corpusDir: String): DataFrame = {
    val p = s"$corpusDir/docs"
    if (!graft.sources.Formats.pathExists(spark, p))
      return spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text"), lit(0L).as("epoch")).limit(0)
    spark.read.parquet(p).dropDuplicates("doc_id", "epoch")
  }

  /** Committed manifest rows (replay copies collapsed per epoch). */
  def manifest(spark: SparkSession, corpusDir: String): DataFrame = {
    val p = s"$corpusDir/manifest"
    if (!graft.sources.Formats.pathExists(spark, p))
      return spark.range(0).select(col("id").as("version"),
        lit(0L).as("n_arrived"), lit(0L).as("n_admitted"),
        lit(0L).as("n_duplicate"), lit(0L).as("n_contaminated"),
        lit(0L).as("n_low_quality")).limit(0)
    spark.read.parquet(p).dropDuplicates("version")
  }

  /** Semi-join a (…, epoch) relation down to manifest-committed epochs ≤ the
    * pinned version — the read-side half of the manifest-last protocol. */
  private def committedOnly(rows: DataFrame, man: DataFrame,
      version: Option[Long]): DataFrame = {
    val committed = version.fold(man)(v => man.filter(col("version") <= v))
      .select(col("version").as("epoch"))
    rows.join(committed, Seq("epoch"), "left_semi")
  }

  /** The lake's committed admitted docs at a pinned version (all committed
    * when None), doc-level latest-epoch-wins. */
  private[graft] def admittedAt(spark: SparkSession, corpusDir: String,
      version: Option[Long]): DataFrame = {
    val rows = committedOnly(admittedRaw(spark, corpusDir),
      manifest(spark, corpusDir), version)
    rows.withColumn("_rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("epoch").desc)))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Time-travel read of the corpus: base corpus ∪ admitted docs with
    * committed epoch ≤ `version` (latest state when None). Latest epoch
    * wins per doc_id, and an admitted re-upload of a BASE doc_id shadows
    * the base row (LWW all the way down). Uncommitted partial epochs are
    * invisible by the manifest semi-join. */
  def readCorpusAt(spark: SparkSession, dir: String, corpusDir: String,
      version: Option[Long] = None): DataFrame = {
    val admitted = admittedAt(spark, corpusDir, version)
    val base = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
      .join(admitted.select(col("doc_id")), Seq("doc_id"), "left_anti")
    base.unionByName(admitted.select(col("doc_id"), col("text")))
  }

  /** The full per-doc admission audit log (committed epochs only). */
  def admissionLog(spark: SparkSession, corpusDir: String): DataFrame = {
    val p = s"$corpusDir/decisions"
    if (!graft.sources.Formats.pathExists(spark, p))
      return spark.range(0).select(col("id").as("doc_id"),
        lit("").as("decision"), lit(0L).as("epoch")).limit(0)
    committedOnly(spark.read.parquet(p).dropDuplicates("doc_id", "epoch"),
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
    * Per-batch cost: admission is ∝ batch (the index serve joins only the
    * batch's own band keys; the benchmark postings broadcast is bounded;
    * quality is a projection); the writes are batch-sized appends; the
    * manifest row is ONE row. Nothing in the loop scans the corpus. */
  def maintainCorpusStream(docStream: DataFrame, spark: SparkSession,
      dir: String, indexDir: String, corpusDir: String, maintDir: String,
      compactAt: Double = 0.25): DataStreamWriter[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val benchPost = graft.sources.Caches.shared(Curate.benchPostings(
      spark, dir, Dedup.incrementalStride(Tables.nDocs(spark, dir))))
    var baseCount = -1L
    var deltaCount = -1L
    docStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        // replay fast path / collision guard: an epoch whose manifest row is
        // already committed is either a checkpoint-replayed batch (crash
        // between the manifest write and the stream's own commit — skipping
        // wholesale IS the exactly-once answer) or an operator error (a
        // fresh checkpoint re-counting epochs against a live lake). Either
        // way the lake must not double-write; the skip is loud so the
        // second case can't pass silently.
        val committed = manifest(spark, corpusDir)
          .filter(col("version") === epoch).limit(1).count() > 0
        if (committed) {
          System.err.println(s"[corpus-lake] epoch $epoch already committed " +
            "- replay skip (if this is NEW data, the stream is running " +
            "against a stale checkpoint; restart it with its original " +
            "checkpoint location)")
        } else if (!batch.isEmpty) {
          val rows = batch.select($"doc_id", $"text")
          val store = s"$maintDir/buckets"
          val haveStore = graft.sources.Formats.pathExists(spark, store)
          val decisions = admitBatch(spark, dir, rows, indexDir,
            if (haveStore) Some(store) else None,
            Some(admittedAt(spark, corpusDir, None).drop("epoch")),
            benchPost).localCheckpoint()
          val admitted = rows.join(
            decisions.filter($"decision" === Curate.Admitted)
              .select($"doc_id"), "doc_id")
          admitted.withColumn("epoch", lit(epoch))
            .write.mode("append").parquet(s"$corpusDir/docs")
          decisions.withColumn("epoch", lit(epoch))
            .write.mode("append").parquet(s"$corpusDir/decisions")
          val newBuckets = Dedup.bucketRows(Dedup.signRows(admitted))
            .withColumn("epoch", lit(epoch))
          val n = newBuckets.count()
          newBuckets.write.mode("append").parquet(store)
          // the manifest row commits the epoch — LAST, after every data write
          decisions.groupBy()
            .agg(count(lit(1)).as("n_arrived"),
              sum(when($"decision" === Curate.Admitted, 1L).otherwise(0L)).as("n_admitted"),
              sum(when($"decision" === Curate.Duplicate, 1L).otherwise(0L)).as("n_duplicate"),
              sum(when($"decision" === Curate.Contaminated, 1L).otherwise(0L)).as("n_contaminated"),
              sum(when($"decision" === Curate.LowQuality, 1L).otherwise(0L)).as("n_low_quality"))
            .select(lit(epoch).as("version"), $"n_arrived", $"n_admitted",
              $"n_duplicate", $"n_contaminated", $"n_low_quality")
            .write.mode("append").parquet(s"$corpusDir/manifest")
          // index upkeep (the maintainDedupIndexStream counters, verbatim)
          if (baseCount < 0) baseCount = spark.read.parquet(
            Similarity.resolveArtifact(spark, indexDir, "buckets")).count()
          if (deltaCount < 0) deltaCount = spark.read.parquet(store).count()
          else deltaCount += n
          if (deltaCount > 0 && deltaCount >= compactAt * baseCount) {
            Dedup.compactDedupIndex(spark, indexDir, store)
            baseCount = -1
            deltaCount = 0
          }
        }
      }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** USER-DECLARED incremental materialized views over the corpus lake —
  * the profile view's signed-retraction algebra ([[CorpusLake]]'s
  * `refreshProfileFromLake` family) generalized to arbitrary grouped
  * aggregates: the caller declares grouping dimensions and SUM measures
  * as SQL expression strings over `(doc_id, text)` (the DLT/dbt
  * convention — a view is data, not code, so the spec is stored with the
  * view and survives restarts), and the lake maintains the aggregate
  * incrementally from its commit feed:
  *
  * {{{
  *   viewDir/spec     one row: dim/measure aliases + SQL expressions
  *   viewDir/base     the aggregate over the base corpus (+ _folded_to
  *                    watermark after a compaction)
  *   viewDir/delta    signed per-(dims, version) contribution rows
  *   viewDir/cursor   last consumed lake version (written LAST)
  * }}}
  *
  * Maintenance is O(changed docs per window), never O(corpus): each
  * refresh lag-windows the changed docs' committed history once, emits
  * +new/−previous contribution rows per (dims, version), and appends
  * them keyed by version — crash-replays recompute byte-identical rows
  * that the read-side (dims, version) dedup collapses. Deletes retract
  * the text they replaced and add nothing; re-admissions past a
  * tombstone retract nothing (the tombstone had no text). Serving folds
  * base + deltas above the watermark in O(groups·versions); the
  * compaction folds deltas into the base under the same `_folded_to`
  * watermark ordering the profile view proved crash-safe. Expressions
  * are validated (analyzed) at CREATE time, so a typo or an
  * out-of-scope column fails the declaration, not the first refresh.
  *
  * At 100 TB this is the dashboard/monitoring surface: corpus-wide
  * grouped statistics that stay fresh at commit cadence for the cost of
  * each window's changed documents, with no full-corpus recompute
  * anywhere in the loop. Views over a BRANCH work unchanged (every read
  * resolves through the branch-aware manifest/admittedRaw overlay). */
object LakeView {

  /** Reserved output columns a declaration may not alias. */
  private val Reserved = Set("n_docs", "version", "_folded_to")

  private def exprs(pairs: Seq[(String, String)]): Seq[Column] =
    pairs.map { case (alias, e) => expr(e).as(alias) }

  /** Declare + materialize a view: validate the expressions, store the
    * spec, and compute the base-corpus aggregate as the starting state.
    * Dimensions group; measures are summed; `n_docs` (the group's doc
    * count) is implicit. Expressions may reference `doc_id` and `text`
    * only — the retraction algebra reconstructs previous document states
    * as (doc_id, prev_text), which is exactly what makes maintenance
    * O(changes). */
  def createView(spark: SparkSession, dir: String, viewDir: String,
      dims: Seq[(String, String)], measures: Seq[(String, String)]): Unit = {
    import spark.implicits._
    require(dims.nonEmpty, "a view needs at least one dimension")
    val aliases = (dims ++ measures).map(_._1)
    require(aliases.distinct.size == aliases.size,
      s"duplicate aliases in ${aliases.mkString(", ")}")
    aliases.foreach(a => require(!Reserved(a) && a.nonEmpty,
      s"alias '$a' is reserved or empty"))
    require(!graft.sources.Formats.pathExists(spark, s"$viewDir/spec"),
      s"$viewDir already holds a view (drop the dir to redeclare)")
    // analyze the declaration against the doc schema NOW: a bad
    // expression must fail the create, not the first refresh
    spark.range(0).select(lit(0L).as("doc_id"), lit("").as("text"))
      .select(exprs(dims ++ measures): _*)
    Seq((dims.map(_._1), dims.map(_._2),
        measures.map(_._1), measures.map(_._2)))
      .toDF("dim_names", "dim_exprs", "measure_names", "measure_exprs")
      .coalesce(1).write.mode("errorifexists").parquet(s"$viewDir/spec")
    viewAggOf(Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")), dims, measures)
      .write.mode("overwrite").parquet(s"$viewDir/base")
  }

  /** The stored declaration: (dims, measures) as (alias, expr) pairs. */
  def viewSpec(spark: SparkSession,
      viewDir: String): (Seq[(String, String)], Seq[(String, String)]) = {
    import spark.implicits._
    val row = spark.read.parquet(s"$viewDir/spec")
      .select(col("dim_names"), col("dim_exprs"),
        col("measure_names"), col("measure_exprs"))
      .as[(Seq[String], Seq[String], Seq[String], Seq[String])].head()
    (row._1.zip(row._2), row._3.zip(row._4))
  }

  /** The view's aggregate over a (doc_id, text) relation. */
  private def viewAggOf(docs: DataFrame, dims: Seq[(String, String)],
      measures: Seq[(String, String)]): DataFrame =
    docs.select(exprs(dims ++ measures): _*)
      .groupBy(dims.map(d => col(d._1)): _*)
      .agg(count(lit(1)).as("n_docs"),
        measures.map(m => sum(col(m._1)).as(m._1)): _*)

  /** Signed per-(dims, version) contribution rows. */
  private def signedRows(texts: DataFrame, sign: Int,
      dims: Seq[(String, String)],
      measures: Seq[(String, String)]): DataFrame =
    texts.select(exprs(dims ++ measures) :+ col("version"): _*)
      .groupBy(dims.map(d => col(d._1)) :+ col("version"): _*)
      .agg((count(lit(1)) * sign).as("n_docs"),
        measures.map(m => (sum(col(m._1)) * sign).as(m._1)): _*)

  /** The signed view deltas of every committed version in (from, head],
    * in ONE lag-windowed pass over the changed docs' history — the
    * generalized `windowDeltas`: deterministic per version regardless of
    * the window split, which is what makes refresh idempotent. */
  private def windowDeltas(spark: SparkSession, dir: String,
      corpusDir: String, from: Long, head: Long,
      dims: Seq[(String, String)],
      measures: Seq[(String, String)]): DataFrame = {
    val man = CorpusLake.manifest(spark, corpusDir)
      .filter(col("version") <= head).select(col("version").as("epoch"))
    val committed = CorpusLake.admittedRaw(spark, corpusDir)
      .join(man, Seq("epoch"), "left_semi")
    val changedIds = committed.filter(col("epoch") > from)
      .select(col("doc_id")).distinct()
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
    val plus = signedRows(
      seq.filter(!col("_del"))
        .select(col("doc_id"), col("text"), col("epoch").as("version")),
      1, dims, measures)
    val minus = signedRows(
      seq.filter(col("prev_text").isNotNull)
        .select(col("doc_id"), col("prev_text").as("text"),
          col("epoch").as("version")),
      -1, dims, measures)
    val sums = col("n_docs") +: measures.map(m => col(m._1))
    plus.unionByName(minus)
      .groupBy(dims.map(d => col(d._1)) :+ col("version"): _*)
      .agg(sum(sums.head).as("n_docs"),
        measures.map(m => sum(col(m._1)).as(m._1)): _*)
  }

  /** Consume the lake's commits past the cursor into signed delta rows —
    * the profile refresh generalized; same floor-refusal, same
    * cursor-written-LAST crash ordering, same idempotent replay. Returns
    * the (from, to] window, or None at the lake head. */
  def refreshViewFromLake(spark: SparkSession, dir: String,
      corpusDir: String, viewDir: String,
      upTo: Option[Long] = None): Option[(Long, Long)] = {
    import spark.implicits._
    val (dims, measures) = viewSpec(spark, viewDir)
    val cPath = Similarity.resolveArtifact(spark, viewDir, "cursor")
    val from =
      if (graft.sources.Formats.pathExists(spark, cPath))
        spark.read.parquet(cPath).agg(max($"last_version")).as[Long].head()
      else Long.MinValue
    val floor = CorpusLake.retentionFloor(spark, corpusDir)
    require(from >= floor ||
        (from == Long.MinValue &&
          !graft.sources.Formats.pathExists(spark,
            Similarity.resolveArtifact(spark, viewDir, "delta"))),
      s"view cursor $from predates the retention floor $floor: the " +
        "history this window's retractions need was vacuumed — rebuild " +
        "the view instead")
    // upTo = bounded catch-up (consume history in operator-sized bites);
    // the per-version delta rows are identical however the window is
    // split, so any split serves the same view
    val head = upTo.fold(CorpusLake.manifest(spark, corpusDir))(u =>
        CorpusLake.manifest(spark, corpusDir).filter(col("version") <= u))
      .filter(col("version") > from)
      .agg(max(col("version"))).as[Option[Long]].head()
    head match {
      case Some(h) =>
        windowDeltas(spark, dir, corpusDir, from, h, dims, measures)
          .write.mode("append").parquet(
            Similarity.resolveArtifact(spark, viewDir, "delta"))
        Seq(h).toDF("last_version")
          .write.mode("overwrite").parquet(s"$viewDir/cursor_compacting")
        Similarity.swapArtifact(spark, viewDir, "cursor")
        Some((from, h))
      case None => None
    }
  }

  /** Serve the maintained view: base + deduped signed deltas above the
    * folded-through watermark, summed per group; groups whose every
    * total cancelled to zero are dropped (a recompute never lists them).
    * O(groups·versions) in, O(groups) out. */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    readViewUpTo(spark, viewDir, None)

  /** View time travel — the view AS OF lake version `version`: fold only
    * the delta rows at or below it. Versions the compaction already
    * folded into the base are REFUSED (their per-version deltas are
    * gone — serving the head-shaped base as if it were history would be
    * silently wrong, the same contract as the lake's retention floor);
    * a version below the first consumed window serves the base-corpus
    * aggregate, which IS the view's state before any lake commit. */
  def readViewAt(spark: SparkSession, viewDir: String,
      version: Long): DataFrame =
    readViewUpTo(spark, viewDir, Some(version))

  private def readViewUpTo(spark: SparkSession, viewDir: String,
      version: Option[Long]): DataFrame = {
    import spark.implicits._
    val (dims, measures) = viewSpec(spark, viewDir)
    val dimCols = dims.map(d => col(d._1))
    val base = spark.read.parquet(
      Similarity.resolveArtifact(spark, viewDir, "base"))
    val (baseRows, foldedTo) =
      if (base.columns.contains("_folded_to"))
        (base.drop("_folded_to"),
          base.agg(max(col("_folded_to"))).as[Long].head())
      else (base, Long.MinValue)
    version.foreach(v => require(v >= foldedTo,
      s"view history at $v was folded into the base (folded through " +
        s"$foldedTo) — compaction collapses per-version deltas; pin a " +
        "version >= the fold watermark"))
    val deltaPath = Similarity.resolveArtifact(spark, viewDir, "delta")
    val rows =
      if (!graft.sources.Formats.pathExists(spark, deltaPath)) baseRows
      else baseRows.unionByName(
        spark.read.parquet(deltaPath)
          .dropDuplicates(dims.map(_._1) :+ "version")
          .filter(col("version") > foldedTo &&
            version.fold(lit(true))(v => col("version") <= v))
          .drop("version"))
    val zeroed = (col("n_docs") === 0) +:
      measures.map(m => col(m._1) === 0)
    rows.groupBy(dimCols: _*)
      .agg(sum(col("n_docs")).as("n_docs"),
        measures.map(m => sum(col(m._1)).as(m._1)): _*)
      .filter(!zeroed.reduce(_ && _))
  }

  /** Fold the delta rows into the base under the `_folded_to` watermark —
    * the profile compaction generalized; serving before ≡ after at every
    * crash point, truncation bounded by the watermark. Run from the
    * maintenance cadence like every rewrite. */
  def compactView(spark: SparkSession, viewDir: String): Unit = {
    import spark.implicits._
    val deltaPath = Similarity.resolveArtifact(spark, viewDir, "delta")
    if (!graft.sources.Formats.pathExists(spark, deltaPath)) return
    val head = spark.read.parquet(deltaPath)
      .agg(max(col("version"))).as[Option[Long]].head()
    head.foreach { h =>
      readView(spark, viewDir)
        .withColumn("_folded_to", lit(h))
        .write.mode("overwrite").parquet(s"$viewDir/base_compacting")
      Similarity.swapArtifact(spark, viewDir, "base")
      spark.read.parquet(deltaPath).filter(col("version") > h)
        .write.mode("overwrite").parquet(s"$viewDir/delta_compacting")
      Similarity.swapArtifact(spark, viewDir, "delta")
    }
  }

  /** The oracled twin: a REAL view (bucket = doc_id mod 7; summed char
    * and whitespace-token counts) declared over the delete-lifecycle
    * lake's base corpus, maintained INCREMENTALLY across its three
    * committed epochs (LWW update, deleteDocs tombstones, re-admission)
    * with a mid-stream compaction, then served. DuckDB recomputes the
    * aggregate directly from the final visible set — hash equality pins
    * the declarative signed algebra end to end. */
  def viewTwin(spark: SparkSession, dir: String): DataFrame = {
    val lake = CorpusLake.deleteLake(spark, dir)
    val viewDir = graft.sources.Caches.memoizedValue[String](spark,
        s"corpus-view|$dir") {
      val v = java.nio.file.Files
        .createTempDirectory("graft-lake-view").toString + "/view"
      createView(spark, dir, v,
        dims = Seq("bucket" -> "CAST(doc_id % 7 AS INT)"),
        measures = Seq(
          "chars" -> "CAST(length(text) AS BIGINT)",
          "toks" -> "CAST(size(split(text, ' ')) AS BIGINT)"))
      // consume the LWW-update epoch only, compact, then consume the
      // delete + re-admission epochs — the serve must not care where the
      // fold boundary fell
      refreshViewFromLake(spark, dir, lake, v, upTo = Some(0L))
      compactView(spark, v)
      refreshViewFromLake(spark, dir, lake, v)
      v
    }
    readView(spark, viewDir).orderBy(col("bucket"))
  }
}

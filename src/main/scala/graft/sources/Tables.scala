package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (see /root/repo/TESTDATA.md).
  *
  * Each loader is a plain `spark.read.parquet` scan: Catalyst handles column
  * pruning and predicate pushdown into the parquet reader, so callers should
  * express filters/projections declaratively and let the optimizer narrow the
  * scan (verified via `.explain` — `PushedFilters` / `ReadSchema`).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the access
  * pattern (one directory per table, schema-on-read) is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    // listing-signature memo of the analyzed read: every bare
    // `spark.read.parquet` runs a one-task schema-inference job, and the
    // bench touches each fixture table hundreds of times per session —
    // pure driver round-trip overhead (guide §5). The handle is an
    // unpersisted plan (execution still scans parquet); a changed fixture
    // dir re-reads via the signature.
    Caches.bySignature[DataFrame](spark, "table", s"$dir/$name.parquet") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Spread a (possibly single-split) scan across all cores before a
    * compute-heavy per-row stage. Small fixture files arrive as ONE input
    * partition (< maxPartitionBytes), which would serialize hashing /
    * signature work onto one task; at 100 TB the scan has thousands of
    * splits and this becomes a no-op-sized round-robin the optimizer can
    * absorb. The shuffle moves the raw rows once — strictly cheaper than
    * leaving a cores-×-idle compute stage. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** Schema-adaptive `events` loader. The fixture generator has stamped
    * `events.ts` as parquet TIMESTAMP(NANOS) in some generations and
    * TIMESTAMP(MICROS) (no UTC adjustment → TIMESTAMP_NTZ on read) in others,
    * so the loader branches on what the footer actually declares:
    *
    *   - plain read succeeds, `ts: TIMESTAMP_NTZ` → cast to session-TZ
    *     TimestampType (session TZ is pinned to UTC by every entrypoint, so
    *     the instant is unchanged and matches DuckDB's naive read);
    *   - plain read succeeds, `ts: TIMESTAMP` → pass through;
    *   - plain read rejects the footer (Spark's vectorized reader refuses
    *     TIMESTAMP(NANOS)) → re-read with the `nanosAsLong` legacy conf and
    *     floor-truncate nanos to Spark's native microsecond TimestampType.
    *
    * The side-effectful legacy conf is only touched on the NANOS fallback
    * path, never for current fixtures. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df =
      try table(spark, dir, "events")
      catch {
        case e: Exception
            if Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
              .exists(t => Option(t.getMessage).exists(_.contains("NANOS"))) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(spark, dir, "events")
      }
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  /** Memoized corpus row count — the knob-derivation inputs (band widths,
    * strides, bloom sizing) need N eagerly before any plan exists, and
    * every operator used to run its own count job per invocation. Same
    * immutable-dir-within-session contract as every `Caches` memo;
    * `releaseAll()` invalidates. */
  def nDocs(spark: SparkSession, dir: String): Long =
    Caches.memoizedCount(spark, s"ndocs|$dir")(documents(spark, dir).count())
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

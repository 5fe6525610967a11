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
    spark.read.parquet(s"$dir/$name.parquet")

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and truncate to a microsecond
    * TimestampType — Spark's native precision. Sub-µs digits are dropped
    * (floor), matching DuckDB comparisons at any realistic granularity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

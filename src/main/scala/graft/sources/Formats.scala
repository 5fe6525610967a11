package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format breadth beyond the parquet fixtures: ORC, JSON-lines,
  * and CSV, with the options that make round-trips exact instead of
  * approximately-right. The reference ingests newline-delimited JSON from
  * Kafka (cassandra_sink.scala:98-114); these are the same payloads as files,
  * plus the columnar/warehouse formats a 100 TB corpus would actually live in.
  *
  * Posture per format:
  *  - ORC/parquet: self-describing schema, splittable, predicate pushdown —
  *    the only sane formats at scale; everything else is an ingest edge.
  *  - JSON lines: schema MUST be declared on read (inference is a full extra
  *    pass and infers `Long` for ints); splittable by line.
  *  - CSV: header + explicit quote/escape, schema declared; no nested types —
  *    callers must flatten or json-encode nested columns first.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-declared JSON-lines read — never schema inference (an extra full
    * pass over the data, and type-lossy: every int becomes long). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** Schema-declared CSV read with RFC-4180 quoting (quote doubling), so
    * free-text columns with commas/newlines/quotes survive the round-trip. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** Media-lake ingestion: a directory of raw files read via the core
    * `binaryFile` source as (path, modificationTime, length, content) —
    * the shape an object-storage media corpus arrives in before its blobs
    * become binary columns. Splittable by FILE (one row per file), with
    * pathGlobFilter/recursiveFileLookup for layout control; pair with
    * `spark.sql.files.maxPartitionBytes` so many small media files pack
    * into few tasks. */
  def readBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** The write side of the media lake: each row's blob lands as its own
    * file named `<id>.bin`, written PER PARTITION on the executors (no
    * driver collect — embarrassingly parallel at any corpus size). Input
    * rows are (id: Long, data: Array[Byte]).
    *
    * Writes go through the Hadoop `FileSystem` resolved from the driver's
    * Hadoop conf (shipped to the tasks as plain key/value pairs), so `dir`
    * may be `hdfs://`/`s3a://`/local — on a multi-node cluster every
    * executor writes to the SAME shared store, and the directory is created
    * inside each task (idempotent) rather than driver-side only. Task
    * retries are safe: blob content is a pure function of the row and
    * `create(overwrite = true)` makes re-execution a byte-identical
    * overwrite, never a duplicate. */
  def writeBlobFiles(df: DataFrame, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val confEntries: Array[(String, String)] =
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toArray
    // a blob write is pure per-row work: spread it over the session's full
    // parallelism (file sources often arrive as a handful of partitions, and
    // one task writing N files serializes an embarrassingly parallel job).
    // The shuffle moves each blob exactly once and only happens when the
    // input is coarser than the session's parallelism.
    val narrow = df.select(df("id"), df("data"))
    val target = spark.sparkContext.defaultParallelism
    val spread =
      if (narrow.rdd.getNumPartitions >= target) narrow
      else narrow.repartition(target)
    spread.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val base = new org.apache.hadoop.fs.Path(dir)
        // newInstance, not the JVM-cached get(): letting us disable the
        // client-side .crc shadow files (pure overhead for blob payloads —
        // object stores and HDFS datanodes checksum server-side) without
        // mutating the cached FS other writers in this executor share
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(base.toUri, conf)
        try {
          fs.setWriteChecksum(false)
          fs.mkdirs(base)
          rows.foreach { r =>
            val out = fs.create(new org.apache.hadoop.fs.Path(base, s"${r.getLong(0)}.bin"), true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
          }
        } finally fs.close()
    }
  }
}

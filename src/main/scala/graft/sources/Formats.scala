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
    * rows are (id: Long, data: Array[Byte]). */
  def writeBlobFiles(df: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select(df("id"), df("data")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]](1))
        }
    }
  }
}

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

  /** True when `path` exists on the session's filesystem — the guard for
    * first-read branches over append stores that may not exist yet (the
    * corpus lake's docs/manifest partitions before the first commit). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

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
      // blob lakes written by [[writeBlobFiles]] are prefix-sharded into
      // subdirectories; recursive lookup reads sharded and flat layouts alike
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** Shard-directory count for blob lakes. Object stores rate-limit per key
    * PREFIX and local filesystems serialize file creation on the parent
    * directory's lock — either way, a million blobs in one flat "directory"
    * is a write hotspot. `s<id % BlobShards>/` prefixes spread the load; at
    * 100 TB the shard count would scale with the writer parallelism. */
  val BlobShards = 64

  /** The write side of the media lake: each row's blob lands as its own
    * file named `s<id % BlobShards>/<id>.bin`, written PER PARTITION on the
    * executors (no driver collect — embarrassingly parallel at any corpus
    * size). Input rows are (id: Long, data: Array[Byte]).
    *
    * Two write paths by scheme, same layout:
    *  - `hdfs://`/`s3a://`/any remote store: through the Hadoop
    *    `FileSystem` resolved from the driver's Hadoop conf (shipped to the
    *    tasks as plain key/value pairs) — on a multi-node cluster every
    *    executor writes to the SAME shared store, and directories are
    *    created inside the tasks (idempotent), not driver-side.
    *  - local paths: direct `java.nio` — measured 5× faster per file than
    *    Hadoop's LocalFileSystem shim (which stats the parent chain and
    *    applies permission handling per create; ~0.9 ms/file vs ~0.2 ms),
    *    and a LOCAL path on a multi-node cluster is per-executor scratch by
    *    definition, so the shared-store argument for the Hadoop layer does
    *    not apply to it.
    *
    * Task retries are safe on both paths: blob content is a pure function
    * of the row and overwrite-create makes re-execution a byte-identical
    * overwrite, never a duplicate. */
  def writeBlobFiles(df: DataFrame, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val scheme = new java.net.URI(dir).getScheme
    val local = scheme == null || scheme == "file"
    val confEntries: Array[(String, String)] =
      if (local) Array.empty
      else spark.sparkContext.hadoopConfiguration.iterator().asScala
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
    val shards = BlobShards
    spread.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (local) {
        val made = new java.util.HashSet[Long]()
        rows.foreach { r =>
          val id = r.getLong(0)
          val shard = id % shards
          val sub = java.nio.file.Paths.get(dir, s"s$shard")
          if (made.add(shard)) java.nio.file.Files.createDirectories(sub)
          java.nio.file.Files.write(sub.resolve(s"$id.bin"), r.getAs[Array[Byte]](1))
        }
      } else {
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
          val made = new java.util.HashSet[Long]()
          rows.foreach { r =>
            val id = r.getLong(0)
            val shard = id % shards
            val sub = new org.apache.hadoop.fs.Path(base, s"s$shard")
            if (made.add(shard)) fs.mkdirs(sub)
            val out = fs.create(new org.apache.hadoop.fs.Path(sub, s"$id.bin"), true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
          }
        } finally fs.close()
      }
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.operators.CorpusLake

/** Forked-JVM driver for [[StreamKillSpec]]: runs the REAL ingest
  * maintenance stream over a file source until the parent test SIGKILLs
  * the process mid-batch. Its only job is to be killable — everything it
  * writes goes through the exact production path
  * ([[CorpusLake.maintainCorpusStream]]), so the directory state the
  * kill leaves behind is the genuine article, not a reconstruction. */
object StreamKillChild {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StreamKillChild <root> <sfDir>")
    val Array(root, dir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$root/warehouse")
      .appName("graft-stream-kill-child")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: the
      .json(s"$root/in")               // batch→commit mapping is pinned
    val q = CorpusLake.maintainCorpusStream(src, spark, dir,
        s"$root/idx", s"$root/corpus", s"$root/maint")
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Round-count demonstration for [[graft.operators.Tokenizer.bpeTrainBatched]]
  * at production-ish merge counts (the oracled query pins 6 merges; a real
  * tokenizer trains 30k). Reports wall time and the trainer's own
  * `[graft] bpe batched: N merges in R rounds` line — the driver-round-trip
  * reduction SCALING.md records.
  *
  * Usage: runMain graft.BpeDemo <sfDir> <nMerges> <batchK>
  */
object BpeDemo {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: BpeDemo <sfDir> <nMerges> <batchK>")
    val Array(dir, nMergesS, kS) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.operators.Tokenizer
      .bpeTrainBatched(spark, dir, nMergesS.toInt, kS.toInt).count()
    println(f"{\"bpe_demo\":{\"merges\":$n,\"k\":$kS,\"sec\":${(System.nanoTime() - t0) / 1e9}%.1f}}")
    spark.stop()
  }
}

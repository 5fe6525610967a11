package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of the named queries (or a default
  * representative set) on sf0.001 — the source for PLANS.md sections.
  *
  * Usage: runMain graft.PlanDump [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q0_reference_pipeline", "q6_filter_agg", "q2_join_broadcast",
      "q12_topk", "dedup_minhash_lsh", "dedup_ngram_jaccard",
      "dedup_embedding_lsh", "text_langid", "q_edit_distance",
      "dedup_contamination", "sim_topk_brute", "q_interval_join",
      "q_salted_join", "pipeline_curate")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n## PLAN $name\n")
          println(fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        case None => System.err.println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
  }
}

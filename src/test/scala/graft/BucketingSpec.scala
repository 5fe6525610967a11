package graft

import org.apache.spark.sql.functions._

/** Write-time co-location: bucketed tables joined on the bucket key must not
  * shuffle either side — the pattern that turns the 100 TB fact⋈fact join
  * from a 2-sided exchange into a local merge per bucket. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans without exchanges") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      graft.sources.Tables.lineitem(spark, sf("sf0.001"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      graft.sources.Tables.orders(spark, sf("sf0.001"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads co-bucketed scans: no Exchange below the join
      val joinSection = plan.split("HashAggregate").last
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
      // and it computes the right thing
      assert(joined.count() == 5)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}

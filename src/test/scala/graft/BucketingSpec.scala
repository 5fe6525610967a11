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

  test("q_bucketed_join: join AND per-orderkey agg ride the buckets; only the presentation sort shuffles") {
    val df = graft.operators.Layout.bucketedJoin(spark, sf("sf0.001"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // the merge hint must not have been overridden by a broadcast
    assert(!plan.contains("BroadcastHashJoin"), plan)
    // no hash exchange anywhere: the scans' bucket partitioning carries the
    // join and the groupBy; the single allowed exchange is the final
    // rangepartitioning for orderBy
    assert(!plan.contains("Exchange hashpartitioning"), plan)

    // and it computes exactly what the shuffled plan computes
    import org.apache.spark.sql.functions._
    val plainOrders = graft.sources.Tables.orders(spark, sf("sf0.001"))
    val plainLi = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
    val plain = plainOrders.join(plainLi, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_quantity"), 2).as("total_qty"),
        max($"l_extendedprice").as("max_price"))
      .filter($"n_items" >= 4)
    assert(df.exceptAll(plain).count() == 0 && plain.exceptAll(df).count() == 0)
  }
}

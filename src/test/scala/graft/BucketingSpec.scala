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

  test("z-order: file-sized chunks stay clustered on BOTH dimensions; a single-key sort does not") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.DataFrame
    // sf0.01: 60k rows over a 2000×100 key space — 128 chunks of ~470 rows
    // cover ≈40×40 z-squares, comfortably below half of either global range
    // (sf0.001's 10-value suppkey space is too coarse to sub-divide)
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
      .select($"l_partkey", $"l_suppkey")
    val n = li.count()
    val chunks = 128
    // avg per-chunk (max-min) of each dimension when sorted by `ord` —
    // the min/max footer stats of 32 written files
    def ranges(sorted: DataFrame): (Double, Double) =
      sorted.withColumn("rn", row_number().over(Window.orderBy($"ord", $"l_partkey", $"l_suppkey")))
        .withColumn("chunk", (($"rn" - 1) * chunks / n).cast("int"))
        .groupBy($"chunk")
        .agg((max($"l_partkey") - min($"l_partkey")).as("pk"),
          (max($"l_suppkey") - min($"l_suppkey")).as("sk"))
        .agg(avg($"pk"), avg($"sk")).as[(Double, Double)].head()
    val (zPk, zSk) = ranges(li.withColumn("ord",
      graft.operators.Layout.zvalue($"l_partkey", $"l_suppkey")))
    val (pkPk, pkSk) = ranges(li.withColumn("ord", $"l_partkey"))
    val (gPk, gSk) = li.agg(
      (max($"l_partkey") - min($"l_partkey")).cast("double"),
      (max($"l_suppkey") - min($"l_suppkey")).cast("double")).as[(Double, Double)].head()
    // the single-key sort nails its own dimension but leaves the other global
    assert(pkSk > gSk * 0.8, s"pk-sorted suppkey range $pkSk vs global $gSk")
    // z-order keeps BOTH dimensions well below global — selective footer
    // stats for predicates on either key (suppkey measured ≈0.51 of global
    // vs ≈1.0 under the single-key sort)
    assert(zPk < gPk * 0.6, s"z partkey range $zPk vs global $gPk")
    assert(zSk < gSk * 0.6, s"z suppkey range $zSk vs global $gSk")
    assert(zSk < pkSk * 0.6, s"z suppkey range $zSk vs pk-sorted $pkSk")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.Num._

/** Relational operator breadth (SURVEY.md §2.3): aggregations, joins of every
  * flavor, window functions, rollup/cube, set ops, sorts/top-k, scalar
  * expressions. Each query is a pure `(SparkSession, sfDir) => DataFrame`
  * combinator over the parquet fixtures, with an ANSI-SQL twin in
  * `SparkEntry.oracleSql`.
  *
  * Scale posture (100 TB): every query here is a declarative Catalyst plan —
  * filters/projections push into the parquet scan, small dimension tables are
  * explicitly `broadcast()`, large joins shuffle on their join keys once, and
  * aggregations get map-side partial aggregation for free. No collect(), no
  * driver-side loops, no RDDs.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: the canonical partial+final hash
    * aggregation. Map-side combine reduces 600k rows (sf0.1) to 4 groups
    * per partition before the single shuffle. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        revenueSum($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        (sum($"l_quantity").cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q6-shaped forecast revenue: scan-only filter + global agg.
    * All three predicates push down to the parquet scan. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1998-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(sum(dec($"l_extendedprice") * dec($"l_discount")).cast("double").as("revenue"))
  }

  /** Broadcast hash join: nation (25 rows) ⋈ region (5 rows). Both sides tiny
    * ⇒ explicit broadcast keeps this shuffle-free at any scale of the fact
    * tables that later join against it. */
  def q2NationRegion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select($"n_nationkey", $"n_name", $"r_name".as("region_name"))
      .orderBy($"n_nationkey")
  }

  /** Multi-way join + agg: revenue per customer for 1997 orders.
    * customer⋈orders shuffles on custkey; orders⋈lineitem on orderkey;
    * the o_orderdate range filter prunes at the orders scan before the join. */
  def q3CustomerRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy($"c_custkey", $"c_name")
      .agg(revenueSum($"l_extendedprice", $"l_discount").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"c_custkey")
  }

  /** Left-semi join (EXISTS): orders having any heavy lineitem, counted by
    * priority. Semi join emits each left row at most once — no fanout. */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val heavy = Tables.lineitem(spark, dir).filter($"l_quantity" > 45)
    o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Left-anti join (NOT EXISTS): customers with no large orders. */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter($"o_totalprice" > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Left-outer join + agg: order count and spend per customer, zeros kept. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
           coalesce(moneySum($"o_totalprice"), lit(0.0)).as("total_spend"))
      .orderBy($"c_custkey")
  }

  /** Window: top-3 orders per customer by price (row_number with a
    * deterministic orderkey tiebreak). One shuffle on the partition key;
    * rank predicate stops per-group scan early under the sort. */
  def q7WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Window frames + lag: running spend and previous order gap per customer.
    * Explicit ROWS frame (not the default RANGE) so peers don't blur the
    * running sum; decimal accumulation keeps it engine-exact. */
  def q8WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val order = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        sum(dec($"o_totalprice")).over(frame).cast("double").as("running_spend"),
        lag($"o_orderdate", 1).over(order).as("prev_orderdate"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Rollup: customer account balance by region ⊃ nation ⊃ total. */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup($"r_name", $"n_name")
      .agg(moneySum($"c_acctbal").as("sum_acctbal"), count(lit(1)).as("n_cust"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** Cube over order status × priority. */
  def q10Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private def custkeysInYear(spark: SparkSession, dir: String, year: Int): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(s"$year-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit(s"${year + 1}-01-01").cast("timestamp"))
      .select($"o_custkey")
  }

  /** Set op: UNION (distinct) of 1997 and 1998 customer keys.
    * Dataset.union is UNION ALL; .distinct() restores ANSI UNION. */
  def q11Union(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    custkeysInYear(spark, dir, 1997).union(custkeysInYear(spark, dir, 1998))
      .distinct().orderBy($"o_custkey")
  }

  /** Set op: INTERSECT — customers active in both years. */
  def q11Intersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    custkeysInYear(spark, dir, 1997).intersect(custkeysInYear(spark, dir, 1998))
      .orderBy($"o_custkey")
  }

  /** Set op: EXCEPT — active in 1997 but not 1998. */
  def q11Except(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    custkeysInYear(spark, dir, 1997).except(custkeysInYear(spark, dir, 1998))
      .orderBy($"o_custkey")
  }

  /** Global top-k with deterministic tiebreak: Spark plans this as a
    * TakeOrderedAndProject — per-partition top-10 then a k-row merge on the
    * driver, no full sort at any scale. */
  def q12TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  /** Distinct aggregation: exact distinct parts+orders per supplier. */
  def q13DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_orderkey").as("n_orders"),
           count(lit(1)).as("n_items"))
      .orderBy($"l_suppkey")
  }

  /** Scalar string functions over part: lower/upper/substring/replace/
    * length/concat — all codegen'd builtins, no UDFs. */
  def q14StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lower"),
        upper($"p_brand").as("brand_upper"),
        substring($"p_type", 1, 5).as("type_prefix"),
        regexp_replace($"p_name", "[aeiou]", "").as("name_novowels"),
        length($"p_name").as("name_len"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"))
      .orderBy($"p_partkey")
  }

  /** Date/time functions: monthly order stats via date_trunc + extract. */
  def q15DateFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", $"o_orderdate").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("sum_price"))
      .withColumn("order_year", year($"order_month"))
      .orderBy($"order_month")
  }

  /** Conditional expressions: CASE / coalesce / nullif buckets. */
  def q16CaseExpr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(
        $"o_orderkey",
        when($"o_totalprice" > 200000, "large")
          .when($"o_totalprice" > 100000, "medium")
          .otherwise("small").as("size_bucket"),
        coalesce(nullif($"o_orderstatus", lit("F")), lit("finished")).as("status_label"))
      .groupBy($"size_bucket", $"status_label")
      .agg(count(lit(1)).as("n"))
      .orderBy($"size_bucket", $"status_label")
  }

  /** GROUPING SETS (beyond rollup/cube): independent per-status and
    * per-priority subtotals plus the grand total in one pass — Catalyst
    * plans one Expand + one aggregation, not three scans. */
  def q17GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Pivot: order spend by year × status as columns (fixed pivot values ⇒
    * single-pass conditional aggregation, no second job to discover keys). */
  def q18Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(moneySum($"o_totalprice"))
      .orderBy($"order_year")
  }

  /** Exact interpolated percentiles per group (sort-based exact percentile;
    * the approximate twin for 100 TB is approx_percentile / t-digest).
    * Rounded to 6dp: interpolation arithmetic may differ in the last ulp
    * across engines. */
  def q19Percentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(percentile($"l_quantity", lit(0.5)), 6).as("med_qty"),
        round(percentile($"l_quantity", lit(0.9)), 6).as("p90_qty"),
        round(percentile($"l_extendedprice", lit(0.99)), 6).as("p99_price"))
      .orderBy($"l_returnflag")
  }

  /** Statistical aggregates: per-group Pearson correlation between quantity
    * and price, with the sample size. Correlation is the one moment-based
    * statistic that is scale-free (a ratio of comoments), so rounding to
    * 6 dp absorbs the partitioning-dependent double-summation drift that
    * makes raw variances/covariances hash-unstable cross-engine; n is
    * exact. One hash-partitioned aggregation, partial+final. */
  def q21Stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
        round(corr($"l_quantity", $"l_discount"), 6).as("corr_qty_disc"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Relative rank-error budget for the quantile-sketch flags: Spark's
    * approx_percentile accuracy parameter 10000 bounds rank error at
    * 1/10000; the value-space check below allows the estimate to sit
    * anywhere between the exact neighbors ±1 % of the group's value range —
    * generous, deterministic, and still falsified by a broken sketch. */
  val QuantileAccuracy = 10000

  /** Quantile SKETCH aggregation (KLL/GK-style `approx_percentile`): the
    * scale path for percentiles — a fixed-size mergeable buffer per group
    * instead of q19's exact per-group sort. Estimates are engine-specific,
    * so (like [[Ingest.sketchDistinct]]) the oracled surface is the exact
    * percentile twin plus literal-TRUE flags asserting each estimate lies
    * within 1 % of the group's value range of the exact answer. */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(percentile($"l_quantity", lit(0.5)), 6).as("exact_med_qty"),
        round(percentile($"l_extendedprice", lit(0.99)), 6).as("exact_p99_price"),
        approx_percentile($"l_quantity", lit(0.5), lit(QuantileAccuracy)).as("aq"),
        approx_percentile($"l_extendedprice", lit(0.99), lit(QuantileAccuracy)).as("ap"),
        (max($"l_quantity") - min($"l_quantity")).as("rq"),
        (max($"l_extendedprice") - min($"l_extendedprice")).as("rp"))
      .select($"l_returnflag", $"exact_med_qty", $"exact_p99_price",
        (abs($"aq" - $"exact_med_qty") <= $"rq" * 0.01).as("med_within_err"),
        (abs($"ap" - $"exact_p99_price") <= $"rp" * 0.01).as("p99_within_err"))
      .orderBy($"l_returnflag")
  }

  /** The bottom-k quantile sample sketch ([[graft.functions.QSketch]]) in
    * its SAMPLED regime: every l_returnflag group holds far more rows
    * than the 4096-occurrence capacity, so this pins the accuracy the
    * views' quantile measures degrade to above capacity — the regime the
    * value-exact `corpus_view_quantile` gate deliberately avoids. Same
    * oracle convention as [[sketchQuantiles]]: exact percentile twin +
    * literal-TRUE flags, here at 5 % of the group's value range (a
    * 4096-sample's rank error concentrates at √(p(1−p)/K) ≈ 0.8 % — the
    * bound is ~4σ of that mapped through a near-uniform value density,
    * not approx_percentile's 10⁻⁴ tier). Occurrence tags come from the
    * row identity (orderkey, linenumber), so duplicate quantities stay
    * distinct sample entries. */
  def sketchQuantileSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = graft.functions.QSketch
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        round(percentile($"l_quantity", lit(0.5)), 6).as("exact_med_qty"),
        round(percentile($"l_quantity", lit(0.9)), 6).as("exact_p90_qty"),
        q.buildAgg(xxhash64($"l_orderkey", $"l_linenumber"),
          $"l_quantity".cast("double")).as("s"),
        (max($"l_quantity") - min($"l_quantity")).as("rq"))
      .select($"l_returnflag", $"n_rows", $"exact_med_qty", $"exact_p90_qty",
        (abs(q.quantile($"s", 0.5) - $"exact_med_qty") <= $"rq" * 0.05)
          .as("med_within_err"),
        (abs(q.quantile($"s", 0.9) - $"exact_p90_qty") <= $"rq" * 0.05)
          .as("p90_within_err"))
      .orderBy($"l_returnflag")
  }

  /** Array scalar functions over the embedding vectors: max/min, slicing,
    * higher-order filter — all codegen'd builtins, float-exact. */
  def q20ArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        array_max($"embedding").as("arr_max"),
        array_min($"embedding").as("arr_min"),
        element_at($"embedding", 1).as("first_dim"),
        size(filter($"embedding", x => x > 0)).as("n_pos"))
      .orderBy($"vec_id")
  }

  /** MapType scalar functions (the §2.3 "map fns" row): per priority a
    * status→count map is BUILT (`map_from_entries` over a sort_array'd
    * entry list — deterministic key order), then consumed with
    * `map_keys`/`map_values`/`element_at`/higher-order `aggregate`. The
    * oracle computes the same scalars relationally — maps are an in-plan
    * representation here, not a storage format, so only the extracted
    * values need to be engine-portable. All builtins, codegen'd. */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority", $"o_orderstatus").count()
      .groupBy($"o_orderpriority")
      .agg(map_from_entries(
        sort_array(collect_list(struct($"o_orderstatus", $"count")))).as("m"))
      .select($"o_orderpriority",
        size(map_keys($"m")).as("n_statuses"),
        coalesce(element_at($"m", "O"), lit(0L)).as("n_open"),
        coalesce(element_at($"m", "F"), lit(0L)).as("n_filled"),
        aggregate(map_values($"m"), lit(0L), _ + _).as("n_total"))
      .orderBy($"o_orderpriority")
  }

  /** As-of join (operator Spark lacks natively): for each event, the most
    * recent order date of the same customer at-or-before the event time.
    *
    * Implemented the scalable way — NOT a range join (which explodes to
    * |events|×|orders per key| intermediate rows): tag both sides, union,
    * then a single shuffle+sort per key and a running `last(ignoreNulls)`
    * window. O(n log n) per key, one exchange, survives 100× scale-up.
    * Right rows sort before left rows at equal timestamps (inclusive <=),
    * and by date so ties resolve to the max — same answer as the oracle's
    * correlated max() subquery.
    */
  def qAsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id".as("k"), $"ts".as("t"), $"event_id",
              lit(null).cast("timestamp").as("o_date"), lit(1).as("side"))
    val o = Tables.orders(spark, dir)
      .select($"o_custkey".as("k"), $"o_orderdate".as("t"),
              lit(null).cast("long").as("event_id"),
              $"o_orderdate".as("o_date"), lit(0).as("side"))
    val w = Window.partitionBy($"k")
      .orderBy($"t".asc, $"side".asc, $"o_date".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_orderdate", last($"o_date", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"event_id", $"k".as("user_id"), $"last_orderdate")
      .orderBy($"event_id")
  }

  /** Table statistics profiling — the ANALYZE pass a lakehouse runs at
    * write time so the optimizer can prune and size joins (min/max feed
    * file skipping and partition pruning, ndv feeds join reordering and
    * AQE build-side choice). One row per profiled lineitem column:
    * (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val) with
    * min/max as doubles (dates as epoch days; the string column reports
    * NULL bounds and its exact ndv).
    *
    * Scale shape: ONE pass over the table — a single global aggregate with
    * multiple DISTINCT aggregates (Catalyst plans the standard Expand:
    * each input row fans to one row per distinct column map-side, and
    * every path partial-aggregates before the one exchange, so the shuffle
    * carries the distinct values + a constant number of partial min/max/
    * count cells, never the table). The row-per-column presentation is a
    * driver-side union of six projections over that single aggregate row.
    * At 100 TB the exact ndv (oracle-able here) is swapped for the HLL
    * sketch the q_sketch_distinct family already provides — same plan
    * shape without the Expand width. */
  def profileStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .withColumn("ship_days",
        datediff($"l_shipdate".cast("date"), to_date(lit("1970-01-01"))))
    val numeric: Seq[(String, String)] = Seq(
      "l_orderkey" -> "l_orderkey", "l_quantity" -> "l_quantity",
      "l_extendedprice" -> "l_extendedprice", "l_discount" -> "l_discount",
      "l_shipdate" -> "ship_days")
    val statCols = Seq(count(lit(1)).as("n")) ++ numeric.flatMap { case (name, c) =>
      Seq(count(col(c)).as(s"nn_$name"),
        count_distinct(col(c)).as(s"nd_$name"),
        min(col(c)).cast("double").as(s"mn_$name"),
        max(col(c)).cast("double").as(s"mx_$name"))
    } ++ Seq(count($"l_returnflag").as("nn_l_returnflag"),
      count_distinct($"l_returnflag").as("nd_l_returnflag"))
    val s = graft.sources.Caches.shared(
      li.agg(statCols.head, statCols.tail: _*))
    val rows = numeric.map { case (name, _) =>
      s.select(lit(name).as("col_name"), $"n".as("n_rows"),
        col(s"nn_$name").as("n_nonnull"), col(s"nd_$name").as("n_distinct"),
        col(s"mn_$name").as("min_val"), col(s"mx_$name").as("max_val"))
    } :+ s.select(lit("l_returnflag").as("col_name"), $"n".as("n_rows"),
      $"nn_l_returnflag".as("n_nonnull"), $"nd_l_returnflag".as("n_distinct"),
      lit(null).cast("double").as("min_val"), lit(null).cast("double").as("max_val"))
    rows.reduce(_ unionByName _).orderBy($"col_name")
  }

  /** The 100 TB twin of [[profileStats]]: ndv via HLL++
    * (`approx_count_distinct`) instead of exact DISTINCT aggregates — the
    * swap the exact operator's scaladoc promises. The sketch is a
    * fixed-size mergeable register array per column, so the production
    * pass is one partial-aggregatable HashAggregate WITHOUT the Expand
    * fanout exact multi-ndv needs (approx_count_distinct is an ordinary
    * aggregate, not a distinct-rewrite) — at 100 TB this is the plan you
    * run; the exact variant is the audit pass.
    *
    * The two passes are PHYSICALLY separate aggregates cross-joined on
    * their single rows: mixing the imperative HLL buffers into the exact
    * variant's multi-distinct aggregate drags them through the ×7 Expand
    * stream and off the fast hash path (measured 10.6 s vs 2.9 s for the
    * exact-only plan at sf0.1) — split, the approx pass costs a plain
    * scan-and-hash-agg and "production drops the audit" means deleting
    * one join input, not rewriting the aggregate.
    *
    * Oracle scheme (the round-3 sketch convention): the row carries the
    * EXACT ndv (DuckDB-checkable twin) plus `ndv_within_rsd`, the
    * |approx − exact| ≤ [[graft.operators.Ingest.SketchRsdBound]]·exact
    * flag the oracle states as literal TRUE — a sketch estimate outside
    * the bound fails the hash gate, so the error bound IS verified at
    * sf0.01. (The exact ndv here exists FOR the oracle; production keeps
    * only the sketch aggregate and the Expand never runs.) */
  def profileStatsSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rsd = graft.operators.Ingest.SketchRsdBound
    val li = Tables.lineitem(spark, dir)
      .withColumn("ship_days",
        datediff($"l_shipdate".cast("date"), to_date(lit("1970-01-01"))))
    val numeric: Seq[(String, String)] = Seq(
      "l_orderkey" -> "l_orderkey", "l_quantity" -> "l_quantity",
      "l_extendedprice" -> "l_extendedprice", "l_discount" -> "l_discount",
      "l_shipdate" -> "ship_days")
    val approxCols = Seq(count(lit(1)).as("n")) ++ numeric.flatMap { case (name, c) =>
      Seq(count(col(c)).as(s"nn_$name"),
        approx_count_distinct(col(c)).as(s"ap_$name"),
        min(col(c)).cast("double").as(s"mn_$name"),
        max(col(c)).cast("double").as(s"mx_$name"))
    } ++ Seq(count($"l_returnflag").as("nn_l_returnflag"),
      approx_count_distinct($"l_returnflag").as("ap_l_returnflag"))
    val exactCols = numeric.map { case (name, c) =>
      count_distinct(col(c)).as(s"nd_$name")
    } :+ count_distinct($"l_returnflag").as("nd_l_returnflag")
    val s = graft.sources.Caches.shared(
      li.agg(approxCols.head, approxCols.tail: _*)
        .crossJoin(li.agg(exactCols.head, exactCols.tail: _*)))
    def flag(name: String) =
      (abs(col(s"ap_$name") - col(s"nd_$name")) <=
        col(s"nd_$name") * rsd).as("ndv_within_rsd")
    val rows = (numeric.map(_._1) :+ "l_returnflag").map { name =>
      val (mn, mx) =
        if (name == "l_returnflag")
          (lit(null).cast("double").as("min_val"), lit(null).cast("double").as("max_val"))
        else (col(s"mn_$name").as("min_val"), col(s"mx_$name").as("max_val"))
      s.select(lit(name).as("col_name"), $"n".as("n_rows"),
        col(s"nn_$name").as("n_nonnull"), col(s"nd_$name").as("n_distinct"),
        flag(name), mn, mx)
    }
    rows.reduce(_ unionByName _).orderBy($"col_name")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Ingest, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a pure (SparkSession, sfDir) => DataFrame over
  * the parquet fixtures; `oracleSql` carries the ANSI-SQL twin executed by
  * DuckDB on the same tables. Column names and value-producing expression
  * shapes match exactly on both sides (decimal-exact money sums, explicit
  * ROWS window frames, deterministic tiebreaks) so hash comparison is stable.
  */
object SparkEntry {

  /** Flagship query; driver smoke-checks rows>0 on sf0.001. The full
    * reference pipeline (SURVEY.md §7.2): Kafka-envelope encode → decode →
    * date derivation → key filter → keyed last-write-wins upsert. */
  def entry(spark: SparkSession): DataFrame =
    Ingest.referencePipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q0_reference_pipeline" -> (Ingest.referencePipeline _),
    "q1_agg"           -> (Relational.q1PricingSummary _),
    "q6_filter_agg"    -> (Relational.q6ForecastRevenue _),
    "q2_join_broadcast"-> (Relational.q2NationRegion _),
    "q3_join_agg"      -> (Relational.q3CustomerRevenue _),
    "q4_semi_join"     -> (Relational.q4SemiJoin _),
    "q5_anti_join"     -> (Relational.q5AntiJoin _),
    "q_outer_join_agg" -> (Relational.qOuterJoin _),
    "q7_window_topk"   -> (Relational.q7WindowTopK _),
    "q8_window_running"-> (Relational.q8WindowRunning _),
    "q9_rollup"        -> (Relational.q9Rollup _),
    "q10_cube"         -> (Relational.q10Cube _),
    "q11_union"        -> (Relational.q11Union _),
    "q11_intersect"    -> (Relational.q11Intersect _),
    "q11_except"       -> (Relational.q11Except _),
    "q12_topk"         -> (Relational.q12TopK _),
    "q13_distinct_agg" -> (Relational.q13DistinctAgg _),
    "q14_string_funcs" -> (Relational.q14StringFuncs _),
    "q15_date_funcs"   -> (Relational.q15DateFuncs _),
    "q16_case_expr"    -> (Relational.q16CaseExpr _),
    "q_asof_join"      -> (Relational.qAsOfJoin _),
  )

  def oracleSql: Map[String, String] = Map(
    // End-to-end twin of the reference pipeline: computes the keyed-upsert
    // final state directly from `events`, verifying the whole Spark-side
    // envelope encode → split → from_json → derive → filter → dedup chain.
    "q0_reference_pipeline" ->
      """SELECT event_type AS fx_marker,
        |  CAST(epoch_ns(ts) // 1000000 AS VARCHAR) AS timestamp_ms,
        |  CAST(CAST(make_timestamp(((epoch_ns(ts) // 1000000) // 1000) * 1000000) AS DATE) AS VARCHAR) AS timestamp_dt
        |FROM events
        |WHERE event_type IS NOT NULL AND event_type != ''
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |                           ORDER BY epoch_ns(ts) // 1000000 DESC) = 1
        |ORDER BY fx_marker""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_filter_agg" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q2_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name AS region_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q3_join_agg" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,

    "q_outer_join_agg" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q7_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  lag(o_orderdate, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderdate
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q9_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q11_union" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |UNION
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q11_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q11_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q13_distinct_agg" ->
      """SELECT l_suppkey,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_items
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,

    "q14_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q15_date_funcs" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(year(date_trunc('month', o_orderdate)) AS INTEGER) AS order_year
        |FROM orders
        |GROUP BY 1
        |ORDER BY order_month""".stripMargin,

    "q16_case_expr" ->
      """SELECT
        |  CASE WHEN o_totalprice > 200000 THEN 'large'
        |       WHEN o_totalprice > 100000 THEN 'medium'
        |       ELSE 'small' END AS size_bucket,
        |  coalesce(nullif(o_orderstatus, 'F'), 'finished') AS status_label,
        |  count(*) AS n
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY size_bucket, status_label""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(o.o_orderdate) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_orderdate
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
  )
}

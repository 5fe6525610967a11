package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** Skew-mitigation patterns. Semantics are identical to the direct
  * formulation (so these stay DuckDB-oracle-checkable); only the physical
  * shuffle shape changes.
  *
  * At 100 TB: `l_returnflag` has 3 distinct values — a direct groupBy sends
  * every row of a 100 TB fact table to 3 reducers. Spark's map-side partial
  * aggregation already absorbs most of this for decomposable aggregates; the
  * explicit two-phase salt below is the general pattern for the cases
  * partial-agg can't fully fix (e.g. exact distincts per hot key, or
  * aggregation buffers too wide to combine map-side). AQE skew-join handles
  * the join-side analog (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in our sessions).
  */
object Skew {

  val Salts = 16

  /** Two-phase salted aggregation over a 3-value hot key: phase 1 aggregates
    * (key, salt) — fanning the hot keys across `Salts`×3 reducers — phase 2
    * combines the partials per key. Decimal sums re-associate exactly, so
    * the result is bit-identical to the direct groupBy (and to the oracle's
    * plain GROUP BY). */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val partial = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(hash($"l_orderkey"), lit(Salts)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum($"l_quantity").as("p_qty"),
        sum(dec($"l_extendedprice")).as("p_price"),
        count(lit(1)).as("p_cnt"))
    partial.groupBy($"l_returnflag")
      .agg(sum($"p_qty").as("sum_qty"),
        sum($"p_price").cast("double").as("sum_price"),
        sum($"p_cnt").as("n_items"))
      .orderBy($"l_returnflag")
  }

  /** Salted replication join — the join-side analog of [[saltedAgg]]: the
    * dimension side is replicated `Salts`× (one copy per salt value), the
    * fact side tags each row with a salt from its content hash, and the join
    * key becomes (key, salt), fanning any hot key's rows across `Salts`
    * reducers instead of one. Each fact row still matches its dimension row
    * exactly once (against its own salt copy), so the result is identical to
    * the plain join — the oracle IS the plain join. AQE's skew-join does
    * this adaptively at runtime for sort-merge joins; the explicit form is
    * the pre-planned variant for known-hot keys and for shuffle-hash paths
    * AQE splitting doesn't reach. Replication cost is Salts×|dimension| —
    * bounded, chosen instead of the unbounded single-reducer hot partition. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
      .withColumn("salt", explode(array((0 until Salts).map(lit): _*)))
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      // deterministic content-hash salt (not rand()): reproducible on any
      // cluster/run; the salt value never affects the result, only placement
      .withColumn("salt", pmod(hash($"l_orderkey", $"l_linenumber"), lit(Salts)))
    // shuffle-hash on purpose: a broadcastable dimension wouldn't need
    // salting at all (and replicating it 16× makes the broadcast 16× worse);
    // the pattern being demonstrated is the shuffled (key, salt) fan-out.
    // The hint sits on the DIMENSION side so it is the hash-map build side
    // (BuildRight): the build stays bounded at Salts×|orders| per partition
    // while the unbounded fact side streams past it.
    li.join(orders.hint("shuffle_hash"),
        li("l_orderkey") === orders("o_orderkey") && li("salt") === orders("salt"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"o_orderpriority")
  }
}

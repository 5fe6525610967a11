package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Skew-mitigation operators must be PURELY physical: bit-identical results
  * to their direct formulations, different shuffle shape only. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("salted join equals the plain join exactly") {
    val plain = graft.sources.Tables.lineitem(spark, dir)
      .join(graft.sources.Tables.orders(spark, dir),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
    val salted = Skew.saltedJoin(spark, dir)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select($"o_orderpriority", $"n_items", $"sum_qty")).count() == 0)
  }

  test("salted join joins on (key, salt) — no row multiplication, no cartesian") {
    val df = Skew.saltedJoin(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
    // the pattern must not degrade to broadcasting the replicated dimension,
    // and the bounded (dimension) side must be the hash build side
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BuildRight"), p)
    // total item count must equal lineitem row count (each row matched once)
    val total = df.agg(sum($"n_items")).head().getLong(0)
    assert(total == graft.sources.Tables.lineitem(spark, dir).count())
  }
}

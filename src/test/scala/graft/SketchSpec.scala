package graft

import org.apache.spark.sql.functions._

/** Bounded-error contract of the HLL++ sketch surface: the estimates behind
  * `q_sketch_distinct`'s oracled `*_within_rsd` flags must actually sit well
  * inside the budget, not just under it, and the exact-count twin must agree
  * with a direct `countDistinct`. */
class SketchSpec extends SparkSpec {

  test("HLL estimates are within the default rsd of exact counts") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
    val rows = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey").as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      // default rsd is 0.05; the estimate should be comfortably inside the
      // 0.15 bound the oracled query asserts
      assert(math.abs(approx - exact) <= 0.15 * exact,
        s"${r.get(0)}: approx=$approx exact=$exact")
    }
  }

  test("q_sketch_distinct emits all-true bounded-error flags") {
    val df = SparkEntry.queries("q_sketch_distinct")(spark, sf("sf0.01"))
    val bad = df.filter(!col("parts_within_rsd") || !col("orders_within_rsd")).count()
    assert(bad == 0)
  }
}

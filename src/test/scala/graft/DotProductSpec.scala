package graft

import org.apache.spark.sql.functions._
import graft.functions.Vec
import graft.functions.DotProduct

/** Native DotProduct expression: equivalence with the HOF formulation,
  * null behavior, codegen participation. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    .select($"vec_id", Vec.asDouble($"embedding").as("v"))

  test("native dot_product equals the HOF formulation bit-for-bit") {
    val joined = emb.as("a").join(emb.as("b"), $"a.vec_id" =!= $"b.vec_id")
      .limit(5000)
      .select(Vec.dot($"a.v", $"b.v").as("native"),
              Vec.dotHof($"a.v", $"b.v").as("hof"))
    assert(joined.filter($"native" =!= $"hof").count() == 0)
  }

  test("null array yields null, not a crash") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val out = df.select(DotProduct($"a", $"b").as("d")).collect()
    assert(out.head.isNullAt(0))
  }

  test("length mismatch and null elements yield null (codegen path)") {
    val df = Seq(
      (1L, Seq(Option(1.0), Option(2.0)), Seq(Option(3.0))),             // ragged
      (2L, Seq(Option(1.0), None), Seq(Option(3.0), Option(4.0))),       // null elem
      (3L, Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0))) // clean
    ).toDF("id", "a", "b")
    val out = df.select($"id", DotProduct($"a", $"b").as("d")).orderBy($"id").collect()
    assert(out(0).isNullAt(1), "ragged arrays must yield null")
    assert(out(1).isNullAt(1), "null element must yield null")
    assert(out(2).getDouble(1) == 11.0)
  }

  test("dot_product participates in whole-stage codegen") {
    val df = emb.select(Vec.dot($"v", $"v").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen regions; the projection
    // carrying dot_product must be inside one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("dot_product")),
      s"dot_product not inside a codegen region:\n$plan")
  }

  test("type check rejects non-double arrays") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception] {
      df.select(DotProduct($"a", $"b")).collect()
    }
  }
}

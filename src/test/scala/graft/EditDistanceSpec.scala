package graft

import org.apache.spark.sql.functions._
import graft.functions.EditDistance

/** Native bit-parallel EditDistance: value-equivalence with the builtin
  * levenshtein across random ASCII, unicode, and >64-char (DP fallback)
  * inputs, plus known values and codegen participation. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("equals builtin levenshtein on random strings (incl. unicode + long)") {
    val rng = new scala.util.Random(42)
    val alphabets = Seq("abcdefgh", "abcdeéüñ中", "ab")
    val cases = (1 to 2000).map { i =>
      val alpha = alphabets(i % alphabets.size)
      def mk(n: Int) = (0 until n).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      // lengths straddle the 64-codepoint bit-parallel/DP boundary
      (mk(rng.nextInt(80)), mk(rng.nextInt(80)))
    } ++ Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"))
    val df = cases.toDF("a", "b")
    val mismatches = df.select(
        EditDistance($"a", $"b").as("native"),
        levenshtein($"a", $"b").as("builtin"))
      .filter($"native" =!= $"builtin")
    assert(mismatches.count() == 0,
      s"examples: ${mismatches.take(3).toSeq}")
  }

  test("known values") {
    val df = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("", "abc")).toDF("a", "b")
    val out = df.select(EditDistance($"a", $"b")).as[Int].collect().toSeq
    assert(out == Seq(3, 2, 3))
  }

  test("null input yields null") {
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    assert(df.select(EditDistance($"a", $"b")).head().isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    // a real scan, so constant folding can't collapse the projection
    val df = graft.sources.Tables.part(spark, sf("sf0.001"))
      .select(EditDistance(lower($"p_name"), $"p_brand").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("edit_distance")),
      s"edit_distance not inside a codegen region:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

/** The KernelRewrites optimizer rule: user-written builtin idioms must plan
  * as the native kernels, with identical values. */
class KernelRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def parts = graft.sources.Tables.part(spark, sf("sf0.001"))

  test("levenshtein(a, b) plans as the native edit_distance kernel") {
    GraftExtensions.register(spark)
    val df = parts.select(levenshtein(lower($"p_name"), $"p_brand").as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("edit_distance"), p)
    assert(!p.contains("levenshtein"), p)
  }

  test("the md5/conv/substring hash60 idiom plans as the native hash60 kernel") {
    GraftExtensions.register(spark)
    val chain = conv(substring(md5($"p_name"), 1, 15), 16, 10).cast("long")
    val df = parts.select(chain.as("h"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hash60"), p)
    assert(!p.contains("md5"), p)
  }

  test("rewritten expressions keep their exact values") {
    GraftExtensions.register(spark)
    // compute the same things through paths the rule does NOT touch
    // (threshold levenshtein is untouched; hash via the kernel directly)
    val df = parts.select(
      levenshtein(lower($"p_name"), $"p_brand").as("lev_rw"),
      levenshtein(lower($"p_name"), $"p_brand", 1000).as("lev_raw"),
      conv(substring(md5($"p_name"), 1, 15), 16, 10).cast("long").as("h_rw"),
      graft.functions.Hash60($"p_name").as("h_kernel"))
    val bad = df.filter($"lev_rw" =!= $"lev_raw" || $"h_rw" =!= $"h_kernel")
    assert(bad.count() == 0, bad.take(3).toSeq.toString)
  }

  test("threshold levenshtein is left untouched") {
    GraftExtensions.register(spark)
    val df = parts.select(levenshtein($"p_name", $"p_brand", 3).as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("levenshtein"), p)
  }
}

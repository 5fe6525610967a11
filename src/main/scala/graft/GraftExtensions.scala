package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharGrams, DotProduct, EditDistance, IntersectCardinality, MinhashSignature, SimhashSignature, WordGramHashes}
import graft.operators.Dedup

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so they are usable from `spark.sql(...)` (and from any
  * SQL-speaking client of a session configured with
  * `spark.sql.extensions=graft.GraftExtensions`):
  *
  *   dot_product(array<double>, array<double>)        → double
  *   simhash(array<bigint>)                           → bigint (48-bit)
  *   minhash(array<bigint>, array<bigint>)            → array<bigint> (16 perms)
  *   intersect_cardinality(array<bigint>, array<bigint>) → int (sorted inputs)
  *
  * This is the (c) extension surface of the build plan: no parser or
  * optimizer rules are needed (SURVEY.md §4.4 — Catalyst's builtins cover
  * every reference rewrite), so the extension point only contributes
  * functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.KernelRewrites)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("simhash",
      info("simhash", "simhash(hashes) - 48-bit SimHash of an array<bigint>"),
      (args: Seq[Expression]) => SimhashSignature(args(0), Dedup.SimhashBits)),
    ("minhash",
      info("minhash", "minhash(h1, h2) - 16-permutation MinHash signature"),
      (args: Seq[Expression]) => MinhashSignature(args(0), args(1),
        Dedup.MinhashPerms, Dedup.MinhashPrime)),
    ("intersect_cardinality",
      info("intersect_cardinality",
        "intersect_cardinality(a, b) - |A∩B| of two sorted array<bigint>"),
      (args: Seq[Expression]) => IntersectCardinality(args(0), args(1))),
    ("edit_distance",
      info("edit_distance",
        "edit_distance(a, b) - Levenshtein distance (bit-parallel, = levenshtein)"),
      (args: Seq[Expression]) => EditDistance(args(0), args(1))),
    ("char_grams",
      info("char_grams",
        "char_grams(s, k) - distinct character k-grams in first-occurrence order"),
      (args: Seq[Expression]) => CharGrams(args(0), literalInt(args(1), "char_grams"))),
    ("word_gram_hashes",
      info("word_gram_hashes",
        "word_gram_hashes(toks, k) - sorted distinct hash60 of word k-grams"),
      (args: Seq[Expression]) => WordGramHashes(args(0), literalInt(args(1), "word_gram_hashes"))),
    ("positional_gram_hashes",
      info("positional_gram_hashes",
        "positional_gram_hashes(toks, k) - hash60 of word k-grams in position order"),
      (args: Seq[Expression]) => graft.functions.PositionalGramHashes(args(0),
        literalInt(args(1), "positional_gram_hashes"))),
    ("count_in_set",
      info("count_in_set",
        "count_in_set(toks, set) - token occurrences whose hash60 is in the literal array<bigint> set"),
      (args: Seq[Expression]) => graft.functions.CountInSet(args(0),
        literalLongArray(args(1), "count_in_set"))),
    ("gear_chunk_ends",
      info("gear_chunk_ends",
        "gear_chunk_ends(data[, divisor]) - content-defined chunk end positions of a binary payload (gear rolling hash; expected chunk size = divisor bytes, default 64)"),
      (args: Seq[Expression]) => graft.functions.GearChunkEnds(args(0),
        if (args.size >= 2) literalInt(args(1), "gear_chunk_ends").toLong
        else graft.functions.GearKernels.GearDivisor)),
    ("qsketch_quantile",
      info("qsketch_quantile",
        "qsketch_quantile(sketch, p) - interpolated quantile p of a bottom-k sample sketch (see qsketch_build/qsketch_union session UDAFs)"),
      (args: Seq[Expression]) => graft.functions.QSketchQuantile(args(0),
        literalDouble(args(1), "qsketch_quantile"))))

  /** The membership set parameterizes a reference object, so it must be a
    * literal array<bigint> — same analysis-time rejection rule as
    * [[literalInt]]. */
  private def literalLongArray(e: Expression, fn: String): Array[Long] = {
    def fail() = throw new IllegalArgumentException(
      s"$fn requires a literal array<bigint> set, got ${e.sql}")
    if (!e.foldable) fail()
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        val out = a.toLongArray()
        java.util.Arrays.sort(out)
        out
      case _ => fail()
    }
  }

  /** The quantile parameterizes the expression object, so it must be a
    * literal double in [0,1] — same analysis-time rejection rule as
    * [[literalInt]]. */
  private def literalDouble(e: Expression, fn: String): Double = {
    def fail() = throw new IllegalArgumentException(
      s"$fn requires a literal double in [0,1], got ${e.sql}")
    if (!e.foldable) fail()
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case _ => fail()
    }
  }

  /** The gram size parameterizes generated code, so it must be a literal
    * int — reject anything else with a readable analysis-time error instead
    * of a ClassCastException (or a silently null-unboxed 0) at eval. */
  private def literalInt(e: Expression, fn: String): Int = {
    def fail() = throw new IllegalArgumentException(
      s"$fn requires a literal integer gram size, got ${e.sql}")
    if (!e.foldable) fail()
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case _ => fail()
    }
  }

  /** Register into an existing session (tests / non-configured sessions).
    * Also binds the quantile-sketch UDAFs (`qsketch_build(tag, value)`,
    * `qsketch_union(sketch)`) — session-scoped `spark.udf` registrations,
    * the standard surface for Aggregator-backed functions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registrations.foreach { case (name, i, builder) =>
      registry.registerFunction(FunctionIdentifier(name), i, builder)
    }
    spark.udf.register("qsketch_build",
      org.apache.spark.sql.functions.udaf(new graft.functions.QSketchBuildAgg))
    spark.udf.register("qsketch_union",
      org.apache.spark.sql.functions.udaf(new graft.functions.QSketchUnionAgg))
    if (!spark.experimental.extraOptimizations.contains(graft.plans.KernelRewrites)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.KernelRewrites
    }
  }
}

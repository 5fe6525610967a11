package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused word-shingle kernels: token array → gram hashes / MinHash signature
  * in ONE compiled pass, with the md5 computed incrementally over the window
  * (no shingle string is ever materialized).
  *
  * These replace the interpreted chain
  *   wordShingles (HOF transform + element_at×k + concat_ws)
  *   → array_distinct → HashArray60 → array_sort
  * whose lambda body re-evaluates ~10 virtual calls per element and whose
  * generated code dominated cold-plan codegen time. Bit-compatibility: the
  * digest input is exactly the space-joined shingle string's UTF-8 bytes, so
  * every value equals the oracle's md5(s[i]||' '||...||s[i+k-1]) forms. */
object ShingleKernels {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def packFirst8(dig: Array[Byte]): Long =
    ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)

  /** first8(md5(window)) for every word k-gram window (space-joined), in
    * order; empty when fewer than k tokens. Null tokens are skipped WITH
    * their separator — exactly concat_ws semantics, so the value stays
    * identical to the wordShingles chain even on arrays with null elements
    * (reachable via the public SQL function). */
  def windowFirst8(toks: ArrayData, k: Int): Array[Long] = {
    val n = toks.numElements()
    if (n < k) return Array.emptyLongArray
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) null
              else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    val d = md.get()
    var w = 0
    while (w + k <= n) {
      d.reset()
      var j = 0
      var wrote = false
      while (j < k) {
        val t = tb(w + j)
        if (t != null) {
          if (wrote) d.update(' '.toByte)
          d.update(t)
          wrote = true
        }
        j += 1
      }
      out(w) = packFirst8(d.digest())
      w += 1
    }
    out
  }

  /** hash60 of every word k-gram IN POSITION ORDER (index i = the gram
    * starting at token i) — the positional-anchor contract of substring
    * dedup, where WHERE a duplicated gram sits matters. */
  def gramH60Positional(toks: ArrayData, k: Int): GenericArrayData = {
    val f8 = windowFirst8(toks, k)
    val hs = new Array[Long](f8.length)
    var i = 0
    while (i < f8.length) { hs(i) = f8(i) >>> 4; i += 1 }
    new GenericArrayData(hs)
  }

  /** SORTED DISTINCT hash60 (= first8 >>> 4) of every word k-gram — the
    * input contract of [[IntersectCardinality]] pairwise verification. */
  def gramH60Sorted(toks: ArrayData, k: Int): GenericArrayData = {
    val f8 = windowFirst8(toks, k)
    val hs = new Array[Long](f8.length)
    var i = 0
    while (i < f8.length) { hs(i) = f8(i) >>> 4; i += 1 }
    java.util.Arrays.sort(hs)
    // dedupe in place (sorted)
    var m = 0
    i = 0
    while (i < hs.length) {
      if (m == 0 || hs(i) != hs(m - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == hs.length) hs else java.util.Arrays.copyOf(hs, m))
  }

  /** MinHash signature of the word k-grams via the double-hash family
    * (h1 = first8 >>> 32, h2 = first8 & 2^32-1; sig[i] = min (h1 + i·h2) mod
    * prime). Null when fewer than k tokens (min over the empty set).
    * Duplicate shingles cannot change a min, so no distinct pass is needed. */
  def minhashOrNull(toks: ArrayData, k: Int, perms: Int, prime: Long): GenericArrayData = {
    val f8 = windowFirst8(toks, k)
    if (f8.isEmpty) return null
    val sig = Array.fill(perms)(Long.MaxValue)
    var w = 0
    while (w < f8.length) {
      val x = f8(w) >>> 32
      val y = f8(w) & 0xffffffffL
      var i = 0
      while (i < perms) {
        val v = (x + i * y) % prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }
}

/** array<string> tokens → array<long>: sorted distinct hash60 of the word
  * k-grams. Value-identical to
  * `array_sort(array_distinct(HashArray60(wordShingles(toks, k))))`
  * (= the oracle's `list_distinct([hash60(s[i]||' '||...) ...])` up to
  * order, which callers never observe — they only intersect/measure). */
case class WordGramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word gram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.gramH60Sorted(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernels.gramH60Sorted($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

object WordGramHashes {
  def apply(toks: Column, k: Int): Column =
    ColumnBridge.toColumn(WordGramHashes(ColumnBridge.toExpression(toks), k))
}

/** array<string> tokens → array<long>: hash60 of every word k-gram in
  * POSITION order (element i = the gram anchored at token i; empty below k
  * tokens) — [[WordGramHashes]] without the sort/distinct, for operators
  * that need to know WHERE a gram sits ([[graft.operators.Dedup]] substring
  * dedup). Same fused single-pass digest, same oracle bit-contract per
  * element. */
case class PositionalGramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word gram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"positional_gram_hashes requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.gramH60Positional(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernels.gramH60Positional($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): PositionalGramHashes =
    copy(child = newChild)
}

object PositionalGramHashes {
  def apply(toks: Column, k: Int): Column =
    ColumnBridge.toColumn(PositionalGramHashes(ColumnBridge.toExpression(toks), k))
}

/** array<string> tokens → array<long>(perms): MinHash signature of the word
  * k-grams, shingling + hashing + permutation mins fused into one pass.
  * Value-identical to `MinhashFromStrings(wordShingles(toks, k), ...)`; null
  * when the document has fewer than k tokens. */
case class MinhashFromTokens(child: Expression, k: Int, perms: Int, prime: Long)
    extends UnaryExpression {
  require(k >= 1 && perms >= 1)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_tokens requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_tokens"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.minhashOrNull(input.asInstanceOf[ArrayData], k, perms, prime)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.ShingleKernels.minhashOrNull($a, $k, $perms, ${prime}L);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashFromTokens =
    copy(child = newChild)
}

object MinhashFromTokens {
  def apply(toks: Column, k: Int, perms: Int, prime: Long): Column =
    ColumnBridge.toColumn(MinhashFromTokens(
      ColumnBridge.toExpression(toks), k, perms, prime))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the dedup signatures.
  *
  * The higher-order-function formulations (kept in the DuckDB oracle SQL and
  * documented in Dedup's scaladoc) evaluate one interpreted expression tree
  * per (element × bit/permutation) — ~10 virtual calls + boxing each. These
  * expressions compile the same arithmetic into a tight primitive loop via
  * doGenCode (~100× per-element), keeping results bit-identical to the SQL
  * twins. Both participate in whole-stage codegen.
  */

/** `bits`-wide SimHash over pre-hashed tokens (`array<long>`; `bits` ≤ 60 so
  * every signature bit draws on a real hash60 bit — `Dedup.simhashBandBits`
  * derives the width from corpus size, 48 at every fixture scale): bit j of
  * the result is set iff Σ_tokens (±1 by bit j of the hash) > 0. Exactly
  * `list_sum([CASE WHEN floor(h/2^j)%2=1 ...])` of the oracle (exact in
  * double arithmetic while bits ≤ 52). */
case class SimhashSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val counts = ctx.freshName("counts"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)
}

object SimhashSignature {
  def apply(hashes: Column, bits: Int): Column =
    ColumnBridge.toColumn(SimhashSignature(ColumnBridge.toExpression(hashes), bits))
}

/** MinHash signature via the double-hash permutation family:
  * sig[i] = min over elements of (h1 + i·h2) mod prime, i in 0..perms-1.
  * Inputs are parallel arrays h1, h2 (32-bit values in longs). Exactly the
  * oracle's `[list_min([(h1 + i*h2) % p ...]) for i ...]`. Null/empty input
  * arrays yield null (callers filter empty shingle sets). */
case class MinhashSignature(left: Expression, right: Expression,
                            perms: Int, prime: Long)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash requires two array<bigint>, got ${l.simpleString}/${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h1 = a.asInstanceOf[ArrayData]
    val h2 = b.asInstanceOf[ArrayData]
    val n = math.min(h1.numElements(), h2.numElements())
    if (n == 0) return null
    val sig = Array.fill(perms)(Long.MaxValue)
    var k = 0
    while (k < n) {
      val x = h1.getLong(k); val y = h2.getLong(k)
      var i = 0
      while (i < perms) {
        val v = (x + i * y) % prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$perms];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $k = 0; $k < $n; $k++) {
         |    long $x = $a.getLong($k);
         |    long $y = $b.getLong($k);
         |    for (int $i = 0; $i < $perms; $i++) {
         |      long $v = ($x + $i * $y) % ${prime}L;
         |      if ($v < $sig[$i]) $sig[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSignature =
    copy(left = newLeft, right = newRight)
}

object MinhashSignature {
  def apply(h1: Column, h2: Column, perms: Int, prime: Long): Column =
    ColumnBridge.toColumn(MinhashSignature(
      ColumnBridge.toExpression(h1), ColumnBridge.toExpression(h2), perms, prime))
}

/** |A ∩ B| for two SORTED distinct `array<long>` columns, by merge-walk —
  * no per-row hash-set allocation, unlike the builtin array_intersect. The
  * value equals `size(array_intersect(a, b))` (= the oracle's
  * `len(list_intersect(...))`) whenever both inputs are sorted + distinct;
  * callers sort once per document, then the pairwise verification join pays
  * only O(|A|+|B|) primitive compares per candidate pair. */
case class IntersectCardinality(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_cardinality requires two array<bigint>, got ${l.simpleString}/${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_cardinality"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val vx = x.getLong(i); val vy = y.getLong(j)
      if (vx == vy) { c += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i);
         |  long $vy = $b.getLong($j);
         |  if ($vx == $vy) { $c++; $i++; $j++; }
         |  else if ($vx < $vy) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCardinality =
    copy(left = newLeft, right = newRight)
}

object IntersectCardinality {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(IntersectCardinality(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}

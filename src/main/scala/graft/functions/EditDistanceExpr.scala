package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Myers' bit-parallel Levenshtein (1999): distance of two strings in
  * O(|text|) word operations when the pattern fits in one 64-bit word,
  * versus the O(|a|·|b|) cell updates of the classic DP that backs the
  * builtin `levenshtein`. Exact same value — verified by a property spec
  * against the builtin — just ~10× less work per pair, which matters in
  * blocked entity-resolution joins where the pair count is ~10⁶ per block
  * sweep (and at 100 TB, per task). Falls back to the classic DP for
  * patterns longer than 64 code points. Operates on code points, so
  * non-ASCII strings agree with the builtin too. */
object EditDistanceKernel {

  def dist(a: UTF8String, b: UTF8String): Int = {
    // work on code points (matches the builtin's character semantics)
    val s = a.toString
    val t = b.toString
    val sp = s.codePointCount(0, s.length)
    val tp = t.codePointCount(0, t.length)
    if (sp == 0) return tp
    if (tp == 0) return sp
    // pattern = shorter string (must fit in 64 bits for the bit-parallel path)
    val (p, pn, x, xn) = if (sp <= tp) (s, sp, t, tp) else (t, tp, s, sp)
    if (pn > 64) return classicDp(p, x)
    myers(p, pn, x, xn)
  }

  private def myers(p: String, pn: Int, x: String, xn: Int): Int = {
    // Peq: ASCII fast path in a flat array; rare code points in a map
    val peqAscii = new Array[Long](128)
    var peqOther: java.util.HashMap[Integer, java.lang.Long] = null
    var i = 0
    var bit = 0
    while (i < p.length) {
      val cp = p.codePointAt(i)
      if (cp < 128) peqAscii(cp) |= (1L << bit)
      else {
        if (peqOther == null) peqOther = new java.util.HashMap()
        val prev = peqOther.get(cp)
        peqOther.put(cp, (if (prev == null) 0L else prev.longValue()) | (1L << bit))
      }
      i += Character.charCount(cp)
      bit += 1
    }
    var pv = -1L
    var mv = 0L
    var score = pn
    val last = 1L << (pn - 1)
    i = 0
    while (i < x.length) {
      val cp = x.codePointAt(i)
      val eq =
        if (cp < 128) peqAscii(cp)
        else if (peqOther == null) 0L
        else { val v = peqOther.get(cp); if (v == null) 0L else v.longValue() }
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      i += Character.charCount(cp)
    }
    score
  }

  private def classicDp(s: String, t: String): Int = {
    val a = s.codePoints().toArray
    val b = t.codePoints().toArray
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var j = 0
    while (j <= b.length) { prev(j) = j; j += 1 }
    var i = 0
    while (i < a.length) {
      cur(0) = i + 1
      j = 0
      while (j < b.length) {
        val cost = if (a(i) == b(j)) 0 else 1
        cur(j + 1) = math.min(math.min(cur(j) + 1, prev(j + 1) + 1), prev(j) + cost)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, b.length + 1)
      i += 1
    }
    prev(b.length)
  }
}

/** Drop-in native replacement for `levenshtein(a, b)` — identical values
  * (see EditDistanceSpec's property check), bit-parallel inner loop. */
case class EditDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"edit_distance requires two strings, got ${l.simpleString}/${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceKernel.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistanceKernel.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistance =
    copy(left = newLeft, right = newRight)
}

object EditDistance {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(EditDistance(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}

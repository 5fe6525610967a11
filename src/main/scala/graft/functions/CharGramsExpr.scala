package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[CharGrams]]: one pass to find code-point boundaries,
  * then zero-walk byte-slice grams — O(bytes + grams), vs the interpreted
  * HOF formulation's O(chars) substr walk per gram (O(n²) total, ~10 virtual
  * calls per element on top). */
object CharGramsKernel {
  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  def grams(s: UTF8String, k: Int): GenericArrayData = {
    val b = s.getBytes
    // char-boundary byte offsets (code points, matching substr semantics)
    val offs = new Array[Int](b.length + 1)
    var n = 0
    var i = 0
    while (i < b.length) {
      offs(n) = i; n += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    offs(n) = b.length
    if (n < k) return Empty
    // distinct in first-occurrence order — same as array_distinct(transform(...))
    val seen = new java.util.LinkedHashSet[UTF8String]((n - k + 1) * 2)
    var c = 0
    while (c + k <= n) {
      seen.add(UTF8String.fromBytes(b, offs(c), offs(c + k) - offs(c)))
      c += 1
    }
    val out = new Array[AnyRef](seen.size())
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** string → array<string>: DISTINCT character k-grams in first-occurrence
  * order, fully compiled. Value-identical to
  * `array_distinct(transform(sequence(0, length(s)-k), i -> substr(s, i+1, k)))`
  * (= the oracle's `list_distinct([substr(s, i, k) for i in range(1, len-k+2)])`)
  * including code-point (not byte) gram boundaries; strings shorter than k
  * yield an empty array. */
case class CharGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char gram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_grams requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(input: Any): Any =
    CharGramsKernel.grams(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharGramsKernel.grams($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  def apply(text: Column, k: Int): Column =
    ColumnBridge.toColumn(CharGrams(ColumnBridge.toExpression(text), k))
}

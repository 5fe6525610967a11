package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot-product over two `array<double>` columns.
  *
  * This is the SURVEY.md §7.4 "cosine top-k at scale" kernel upgrade: the
  * higher-order-function formulation (`aggregate(zip_with(a, b, *), 0, +)`)
  * allocates an intermediate array and evaluates two lambda closures per
  * element; this expression runs a primitive fused multiply-add loop directly
  * over the columnar ArrayData — no allocation, no virtual calls — and
  * participates in whole-stage codegen via doGenCode.
  *
  * Semantics match the HOF version exactly: left-to-right double
  * accumulation; null if either array is null, if the lengths differ, or if
  * any element is null (zip_with pads the shorter side with nulls and a null
  * product nulls the aggregate sum — so mismatch/null-element both yield
  * null there too). This keeps it a drop-in replacement for [[Vec.dot]]
  * wherever the plan is hot, including as the public SQL `dot_product`
  * function where ragged/null input is reachable. The element null checks
  * are emitted only when an input's ArrayType.containsNull — fixed-width
  * non-null embedding vectors keep the tight two-instruction loop.
  * Oracle-checkability is unchanged (same value as the SQL twin).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry: dot(a, b) as a native codegen'd expression. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProduct(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}

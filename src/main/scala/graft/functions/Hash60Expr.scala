package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** string → bigint: the engine-portable 60-bit hash as ONE compiled digest +
  * shift. Value-identical to the interpreted chain
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long` (= DuckDB's
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`) — see
  * [[HashKernels]] for the bit-compatibility contract — without
  * materializing the 32-char hex string or parsing it back. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash60 requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(input: Any): Any =
    HashKernels.h60(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.h60($a);")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  def apply(s: Column): Column =
    ColumnBridge.toColumn(Hash60(ColumnBridge.toExpression(s)))
}

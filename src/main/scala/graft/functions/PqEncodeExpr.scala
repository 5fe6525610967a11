package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Static PQ-encoding kernel shared by interpreted eval and codegen. */
object PqKernels {

  // non-finite guard (the CentroidKernels convention): a NaN/Inf input
  // element makes the squared distance non-finite, and BigDecimal(NaN)
  // throws — pass non-finite values through un-rounded instead of
  // crashing the task.
  private def round6(d: Double): Double =
    if (!java.lang.Double.isFinite(d)) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Nearest-codebook-entry codes for one vector, all `m` subspaces in one
    * pass over the flat codebook (entry e's subspace-s block starts at
    * e·m·subDims + s·subDims). Selection key per subspace is
    * (round(Σ(v−c)², 6), entry index) ascending — EXACTLY the DataFrame
    * formulation's min_by(cidx, struct(round6(dist), cid)) because cidx is
    * cid-ordered. Raw squared distances order-agree with their 6dp
    * roundings whenever they differ by ≥ 2·10⁻⁶ (each rounding moves a
    * value ≤ 5·10⁻⁷), so the comparison loop stays in primitive doubles
    * and only falls back to BigDecimal rounding inside that boundary zone
    * — the oracle-exact semantics at interpreted-never cost. */
  def pqEncode(v: ArrayData, cb: Array[Double], m: Int, subDims: Int): Array[Int] = {
    val entries = cb.length / (m * subDims)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestIdx = 0
      var bestRaw = Double.MaxValue
      var e = 0
      while (e < entries) {
        var raw = 0.0
        val base = e * m * subDims + s * subDims
        var i = 0
        while (i < subDims) {
          val d = v.getDouble(s * subDims + i) - cb(base + i)
          raw += d * d
          i += 1
        }
        if (e == 0 || raw <= bestRaw - 2e-6) {
          bestIdx = e; bestRaw = raw
        } else if (raw < bestRaw + 2e-6) {
          // boundary zone: the rounded values decide; ties keep the
          // earlier (lower-cid) entry
          if (round6(raw) < round6(bestRaw)) { bestIdx = e; bestRaw = raw }
        }
        e += 1
      }
      codes(s) = bestIdx
      s += 1
    }
    codes
  }
}

/** Native PQ encoder: `array<double>` vector in, [[graft.operators.Similarity.PqM]]
  * codes out, against a plan-constant flat codebook (collected once on the
  * driver — ≤ 256 entries × 64 doubles, the centroid-literal pattern — and
  * shipped to executors as a reference object, not a join side).
  *
  * This replaces the encode-via-fanout formulation (corpus × broadcast
  * codebook cross join, 8 min_by aggregates): same 256×64 flops per vector,
  * but as ONE projection row instead of 256 joined rows through a hash
  * aggregate — no fan-out, no aggregation buffers, no exchange. The
  * DataFrame twin is kept as `Similarity.pqEncodeViaJoin` and `DedupSpec`
  * pins bit-equality of the two on every fixture scale. */
case class PqEncode(child: Expression, cb: Seq[Double], m: Int, subDims: Int)
    extends UnaryExpression {

  // Seq field keeps case-class VALUE equality for plan-equality cache
  // dedup/canonicalization; the kernel reads a primitive array
  @transient private lazy val cbArr = cb.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, true) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PqKernels.pqEncode(input.asInstanceOf[ArrayData], cbArr, m, subDims))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqKernels.pqEncode($v, $cbRef, $m, $subDims));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, cb: Seq[Double], m: Int, subDims: Int): Column =
    ColumnBridge.toColumn(PqEncode(ColumnBridge.toExpression(v), cb, m, subDims))
}

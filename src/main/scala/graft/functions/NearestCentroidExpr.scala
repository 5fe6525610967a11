package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Static nearest-centroid kernel shared by interpreted eval and codegen. */
object CentroidKernels {

  // non-finite guard: a zero-norm vector or centroid yields NaN/±Inf
  // cosines, and BigDecimal(NaN) throws NumberFormatException — crashing
  // the task where the max_by join twin degrades gracefully (Spark's
  // round() passes NaN through). Non-finite values skip the rounding.
  private def round6(d: Double): Double =
    if (!java.lang.Double.isFinite(d)) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Argmax over centroids by (round(cos, 6) desc, cent_id asc) — EXACTLY
    * the DataFrame formulation's max_by(cent_id, struct(cosine6, −cent_id))
    * because `ids` is cent_id-ascending, so first-wins-on-tie is the lower
    * id. Raw cosines order-agree with their 6dp roundings whenever they
    * differ by ≥ 2·10⁻⁶; only the boundary zone pays the BigDecimal
    * comparison (the [[PqKernels.pqEncode]] convention). Returns
    * (winner index, round6(winner cosine)). */
  def nearest(v: ArrayData, nrm: Double, flat: Array[Double],
      norms: Array[Double], dims: Int): (Int, Double) = {
    val k = norms.length
    var bestIdx = 0
    var bestRaw = Double.MinValue
    var e = 0
    while (e < k) {
      var acc = 0.0
      val base = e * dims
      var i = 0
      while (i < dims) {
        acc += v.getDouble(i) * flat(base + i)
        i += 1
      }
      val raw = acc / (nrm * norms(e))
      if (e == 0 || raw >= bestRaw + 2e-6) {
        bestIdx = e; bestRaw = raw
      } else if (raw > bestRaw - 2e-6) {
        // boundary zone: the rounded values decide; ties keep the
        // earlier (lower-cent_id) entry
        if (round6(raw) > round6(bestRaw)) { bestIdx = e; bestRaw = raw }
      }
      e += 1
    }
    (bestIdx, round6(bestRaw))
  }

  /** Boxed wrapper for codegen (tuple returns don't cross the Janino
    * boundary cleanly): (cent_id, csim) as a 2-field InternalRow. */
  def nearestRow(v: ArrayData, nrm: Double, ids: Array[Long],
      flat: Array[Double], norms: Array[Double], dims: Int): InternalRow = {
    val (idx, csim) = nearest(v, nrm, flat, norms, dims)
    new GenericInternalRow(Array[Any](ids(idx), csim))
  }
}

/** Native nearest-centroid assignment: `array<double>` vector + its norm
  * in, `struct(cent_id, csim)` out, against a plan-constant centroid set
  * (collected once on the driver, cent_id-ascending — the centroid-literal
  * pattern `semanticDedupStream` already uses — and shipped as reference
  * objects, not a join side).
  *
  * Replaces the assign-via-fanout formulation (corpus × broadcast
  * centroids, max_by aggregate): same k×dims flops per vector, but as ONE
  * projection row instead of k joined rows through an aggregation buffer
  * and an exchange — nearest-centroid assignment becomes completely
  * shuffle-free. The DataFrame twin is kept as
  * `Similarity.assignedCellsViaJoin` and `DedupSpec` pins equality. */
case class NearestCentroid(left: Expression, right: Expression,
    ids: Seq[Long], flat: Seq[Double], norms: Seq[Double], dims: Int)
    extends BinaryExpression {

  // Seq fields keep case-class VALUE equality (plan-equality cache dedup
  // and canonicalization depend on it — Array fields compare by reference);
  // the kernel reads primitive arrays, converted once per task
  @transient private lazy val idsArr = ids.toArray
  @transient private lazy val flatArr = flat.toArray
  @transient private lazy val normsArr = norms.toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires (array<double>, double), got ${l.simpleString}/${r.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any, n: Any): Any =
    CentroidKernels.nearestRow(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], idsArr, flatArr, normsArr, dims)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncids", idsArr, "long[]")
    val flatRef = ctx.addReferenceObj("ncflat", flatArr, "double[]")
    val normsRef = ctx.addReferenceObj("ncnorms", normsArr, "double[]")
    nullSafeCodeGen(ctx, ev, (v, n) => {
      s"""
         |${ev.value} = graft.functions.CentroidKernels.nearestRow(
         |  $v, $n, $idsRef, $flatRef, $normsRef, $dims);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  def apply(v: Column, nrm: Column, ids: Seq[Long],
      flat: Seq[Double], norms: Seq[Double], dims: Int): Column =
    ColumnBridge.toColumn(NearestCentroid(
      ColumnBridge.toExpression(v), ColumnBridge.toExpression(nrm),
      ids, flat, norms, dims))
}

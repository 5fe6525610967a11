package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the `Aggregator[IN, BUF, OUT]` surface of SURVEY.md §2.3):
  * element-wise centroid of fixed-dimension vectors.
  *
  * Buffer = (per-dimension double sums, count); merge is element-wise —
  * associative and commutative, so map-side partial aggregation applies and
  * the shuffle carries one 64-double buffer per (group × partition), not the
  * vectors. Callers round the output before comparisons: double summation
  * order varies with partitioning, so the last ulp is not stable (the same
  * reason functions.Num uses decimals for money — here 6-dp rounding is the
  * appropriate contract for similarity math).
  */
class CentroidAgg(dims: Int)
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)

  /** Null and wrong-dimension vectors are ignored entirely (not summed, not
    * counted) — a partially-summed-but-fully-counted short vector would skew
    * the centroid toward zero in the missing dimensions, diverging from the
    * SQL twin, which unnests exactly `dims` elements per row. Callers must
    * mirror the same contract in any SQL twin (filter nulls first). */
  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null || v.length != dims) return b
    val (sums, n) = b
    var i = 0
    while (i < dims) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a; val (sb, nb) = b
    var i = 0
    while (i < dims) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  /** Empty input → null (SQL AVG semantics), never a fabricated zero vector. */
  override def finish(b: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = b
    if (n == 0) null else sums.map(_ / n).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

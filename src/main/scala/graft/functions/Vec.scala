package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<double>` embedding columns, as pure
  * higher-order-function expression trees (codegen'd, shuffle-free,
  * engine-portable for oracle checking).
  *
  * Determinism: dot products accumulate left-to-right in doubles on both
  * engines; results are rounded to 6 dp before any threshold/ranking so the
  * residual 1-ulp summation differences between engines can never flip a
  * comparison (SURVEY.md §5.2 design rule).
  *
  * At 100 TB: these stay per-row projections (no shuffle); the planned
  * upgrade path for the hot dot-product kernel is a custom Catalyst
  * Expression with doGenCode over primitive arrays — same Column seam.
  */
object Vec {
  /** Cast an array<float> parquet column to array<double> for exact-ish math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right dot product of two equal-length array<double> columns.
    * Backed by the native codegen'd [[DotProduct]] expression; [[dotHof]]
    * keeps the pure higher-order-function formulation (same semantics, used
    * as the cross-check + the fallback shape other engines can mirror). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** HOF twin of [[dot]]: allocates a zipped array + two lambdas per row —
    * kept for equivalence testing and as documentation of the semantics. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (engine-portable comparisons). */
  def cosine6(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dot(a, b) / (normA * normB), 6)

  /** Random-hyperplane LSH bit j (deterministic across engines): the
    * hyperplane's component in dimension d is ±1 by the parity of
    * hash60(j ++ "_" ++ d); bit = (v · plane_j) > 0. */
  def lshBit(v: Column, j: Column, dims: Int): Column =
    aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
      (acc, d) => acc + element_at(v, d + 1) *
        when(Text.hash60(concat(j.cast("string"), lit("_"), d.cast("string"))) % 2 === 1, 1.0)
          .otherwise(-1.0)) > 0
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers for oracle-deterministic aggregation.
  *
  * Money columns in the fixtures are doubles carrying 2-decimal values.
  * Summing doubles is order-dependent (shuffle/partition order changes the
  * last ulp), which breaks hash-comparison against any other engine. We cast
  * to exact decimal before aggregating — decimal sums are associative and
  * exact — and cast the final scalar back to double. The same shape is used
  * in the DuckDB oracle SQL, so results are bit-identical regardless of
  * parallelism (32 local threads today, 1000 executors at 100 TB).
  */
object Num {
  /** Exact 2-dp decimal view of a money-ish double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-dp money column, returned as double. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact revenue sum: sum(price * (1 - discount)) in decimal, as double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount))).cast("double")
}

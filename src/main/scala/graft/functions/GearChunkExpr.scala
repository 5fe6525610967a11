package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Gear-hash content-defined chunking kernel (the FastCDC/gear family:
  * a per-byte table lookup folded into a rolling window sum — the O(1)/byte
  * boundary scan every production CDC store runs, vs the O(window)
  * hash-per-position formulation it replaces here).
  *
  * Boundary contract (mirrored closed-form by the DuckDB oracles, which is
  * why the arithmetic is EXACT int64 with no wraparound):
  *  - gear[b] = hash60("gear|" + b) mod 2⁴⁰ for byte value b — derived from
  *    the engine-portable md5 hash, so both engines build the identical
  *    table ([[gearSqlList]] interpolates it into the oracle SQL from the
  *    same function).
  *  - window hash at 1-based END position i (window = the trailing
  *    [[GearWindow]] bytes): h_i = Σ_{t=0}^{7} gear[byte_{i−t}]·2ᵗ —
  *    newest byte weight 1, oldest 2⁷; max value 8·2⁴⁰·2⁷ = 2⁵⁰, so the
  *    sum fits signed 64-bit exactly and the oracle's list_sum matches
  *    bit-for-bit with NO modular reduction to reproduce.
  *  - boundary iff bits 20–25 of h are zero ((h >> 20) % 64 == 0) —
  *    mid bits, mixed from every window byte; expected rate 1/64 ⇒
  *    expected 64-byte chunks (the fixed-frame size, for size-for-size
  *    comparison). End positions i ∈ [8, n−1]; n itself always ends the
  *    last chunk.
  *
  * The kernel maintains h ROLLING — h_i = 2·(h_{i−1} − gear[leaving]·2⁷) +
  * gear[entering] — three integer ops per byte; a 100 TB boundary scan is
  * a table-lookup stream, not a hash-per-position pass. */
object GearKernels {

  val GearWindow = 8
  val GearDivisor = 64L
  private val MidShift = 20

  /** The 256-entry byte table, derived once from the portable hash60. */
  val gearTable: Array[Long] =
    Array.tabulate(256)(b => HashKernels.h60(s"gear|$b") % (1L << 40))

  /** The table as a DuckDB list literal (1-based indexing on the oracle
    * side) — single source of truth for both engines. */
  def gearSqlList: String = gearTable.mkString("[", ", ", "]")

  /** Content-defined chunk END positions (1-based, ascending, final n
    * included) of a byte payload. n ≤ window ⇒ one chunk [1..n].
    * `divisor` sets the expected chunk size (boundary rate 1/divisor). */
  def chunkEnds(data: Array[Byte], divisor: Long): GenericArrayData = {
    val n = data.length
    if (n <= GearWindow) return new GenericArrayData(Array(n))
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    // seed h for end position i = GearWindow (bytes 1..8, 1-based)
    var h = 0L
    var j = 0
    while (j < GearWindow) {
      h = h * 2 + gearTable(data(j) & 0xff)
      j += 1
    }
    var i = GearWindow // 1-based end position of the current window
    while (i <= n - 1) {
      if (((h >>> MidShift) % divisor) == 0L) ends += i
      // roll: drop byte (i-8) zero-based index i-8, enter byte i (0-based i)
      h = 2L * (h - (gearTable(data(i - GearWindow) & 0xff) << (GearWindow - 1))) +
        gearTable(data(i) & 0xff)
      i += 1
    }
    ends += n
    new GenericArrayData(ends.toArray)
  }
}

/** `binary` payload → `array<int>` of content-defined chunk end positions
  * (see [[GearKernels.chunkEnds]] for the exact boundary contract;
  * `divisor` = expected chunk bytes — a granularity POLICY knob, not a
  * derived constant: storage dedup chunks at [[GearKernels.GearDivisor]]
  * for frame-size-for-size comparison, the perceptual fingerprint at a
  * finer grain for vote density). */
case class GearChunkEnds(child: Expression,
    divisor: Long = GearKernels.GearDivisor) extends UnaryExpression {
  // analysis-time rejection (the literalInt convention): a non-positive
  // divisor would otherwise surface as a per-row ArithmeticException deep
  // inside a task
  require(divisor >= 1, s"gear_chunk_ends divisor must be >= 1, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gear_chunk_ends requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gear_chunk_ends"

  override def nullSafeEval(input: Any): Any =
    GearKernels.chunkEnds(input.asInstanceOf[Array[Byte]], divisor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GearKernels.chunkEnds($a, ${divisor}L);")

  override protected def withNewChildInternal(newChild: Expression): GearChunkEnds =
    copy(child = newChild)
}

object GearChunkEnds {
  def apply(data: Column): Column =
    ColumnBridge.toColumn(GearChunkEnds(ColumnBridge.toExpression(data)))
  def apply(data: Column, divisor: Long): Column =
    ColumnBridge.toColumn(GearChunkEnds(ColumnBridge.toExpression(data), divisor))
}

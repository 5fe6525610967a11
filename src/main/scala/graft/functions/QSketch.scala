package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable quantile sketch: a DETERMINISTIC bottom-k uniform sample.
  *
  * Each (tag, value) occurrence is keyed by `h = mix64(tag ⊕ φ·bits(value))`
  * — `tag` is a per-document 64-bit hash (`xxhash64(doc_id)` at the call
  * sites), so equal values from different documents stay distinct
  * occurrences while replays of the SAME occurrence collapse. The sketch
  * keeps the K occurrences with the smallest keys: a uniform sample of the
  * multiset whose membership is a pure function of the input SET, so
  *
  *   - building is order- and partitioning-independent (same bytes on any
  *     cluster layout — the property the lake's replay-dedup protocol
  *     needs, mirroring `hll_sketch_agg`),
  *   - two sketches over disjoint (or overlapping) multisets MERGE by
  *     keeping the K smallest keys of their union — bottom-k sampling is
  *     closed under union, which is what lets insert-only maintenance
  *     windows fold new sketches onto a running one,
  *   - when the multiset has ≤ K occurrences the "sample" is the whole
  *     multiset and interpolated quantiles are EXACT (they equal Spark's
  *     `percentile`); above K the rank error of quantile p concentrates at
  *     √(p(1−p)/K) — ~0.8% at the median for the default K.
  *
  * Deletion cannot be undone inside the sketch (removing a sampled
  * occurrence leaves a hole bottom-k cannot refill) — the same documented
  * trade as HLL: retraction-touched groups re-sketch from the visible set.
  *
  * Binary layout (little-endian): int32 m, then m × (int64 key,
  * float64 value) sorted ascending by (key, value-bits) — a canonical
  * serialization, so byte equality ⇔ sample equality. 16·K bytes at
  * capacity (64 KiB at K=4096) per (group, version) row: the standard
  * sketch-size/accuracy trade, sized for group-per-dashboard-cell
  * cardinalities, not per-document state. */
object QSketchKernel {

  /** Sample capacity. 4096 ⇒ median rank error ~0.8% (1σ), 64 KiB max. */
  val K = 4096

  /** 64-bit finalizer (murmur3's fmix64 constants — public domain). */
  def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Occurrence key: tag (who) mixed with the value's bits (what). */
  def entryKey(tag: Long, v: Double): Long =
    mix64(tag ^ (java.lang.Double.doubleToLongBits(v) * 0x9e3779b97f4a7c15L))

  /** Canonical bytes of (keys, values) entries: sort by (key, value bits),
    * drop exact duplicates (the same occurrence replayed), cap at K. */
  def serialize(ks: Array[Long], vs: Array[Double], n: Int): Array[Byte] = {
    val idx = Array.range(0, n).sortBy(i => (ks(i), java.lang.Double.doubleToLongBits(vs(i))))
    val outK = new Array[Long](math.min(n, K))
    val outV = new Array[Double](outK.length)
    var m = 0
    var i = 0
    while (i < n && m < K) {
      val j = idx(i)
      if (m == 0 || ks(j) != outK(m - 1) || vs(j) != outV(m - 1)) {
        outK(m) = ks(j); outV(m) = vs(j); m += 1
      }
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * m)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(m)
    var t = 0
    while (t < m) { bb.putLong(outK(t)); bb.putDouble(outV(t)); t += 1 }
    bb.array()
  }

  /** Validate the header and return the entry count — the ONE place the
    * binary format's invariants live; both readers go through it, so a
    * format change cannot silently re-open the BufferUnderflow/garbage
    * hole in whichever reader was skipped. */
  private def validatedCount(b: Array[Byte]): Int = {
    require(b.length >= 4, s"qsketch: binary too short (${b.length} B)")
    val m = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    require(m >= 0 && m <= K && b.length == 4 + 16 * m,
      s"qsketch: corrupt header (m=$m, ${b.length} B; expected ${4 + 16 * math.max(m, 0)})")
    m
  }

  /** (keys, values) of a serialized sketch. A malformed binary (foreign
    * column fed to the union/quantile, truncated artifact) fails with a
    * named error instead of a BufferUnderflow or a silent garbage read. */
  def deserialize(b: Array[Byte]): (Array[Long], Array[Double]) = {
    val m = validatedCount(b)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.getInt // skip the validated header
    val ks = new Array[Long](m); val vs = new Array[Double](m)
    var i = 0
    while (i < m) { ks(i) = bb.getLong; vs(i) = bb.getDouble; i += 1 }
    (ks, vs)
  }

  /** Interpolated quantile p of the sampled values (exact `percentile`
    * semantics when the sample is the whole multiset); null when empty. */
  def quantileBoxed(b: Array[Byte], p: Double): java.lang.Double = {
    val (_, vs) = deserialize(b)
    if (vs.isEmpty) return null
    java.util.Arrays.sort(vs)
    val r = p * (vs.length - 1)
    val lo = math.floor(r).toInt
    val hi = math.min(lo + 1, vs.length - 1)
    vs(lo) + (r - lo) * (vs(hi) - vs(lo))
  }

  /** Sampled occurrence count (≤ K; the full count at or below K). Same
    * validate-on-read posture as [[deserialize]] — both go through
    * [[validatedCount]]. */
  def sampleSize(b: Array[Byte]): Int = validatedCount(b)
}

/** Mutable accumulation buffer: parallel (key, value) arrays with a fill
  * cursor; arrays are mutated in place (the [[Aggregator]] contract allows
  * it) and compacted back to K whenever the 2K scratch fills — amortized
  * O(log K) per insert, one 64 KiB-bounded buffer per partition × group. */
case class QBuf(ks: Array[Long], vs: Array[Double], n: Int)

private[functions] object QBuf {
  val empty: QBuf = QBuf(Array.emptyLongArray, Array.emptyDoubleArray, 0)

  def append(b: QBuf, k: Long, v: Double): QBuf = {
    val b1 = if (b.n < b.ks.length) b else grow(b)
    b1.ks(b1.n) = k; b1.vs(b1.n) = v
    b1.copy(n = b1.n + 1)
  }

  private def grow(b: QBuf): QBuf = {
    val cap = 2 * QSketchKernel.K
    if (b.ks.length < cap)
      QBuf(java.util.Arrays.copyOf(b.ks, math.max(64, math.min(cap, b.ks.length * 2))),
        java.util.Arrays.copyOf(b.vs, math.max(64, math.min(cap, b.vs.length * 2))), b.n)
    else compact(b) // full scratch: fold down to ≤ K, reuse the arrays
  }

  /** Keep the ≤K smallest distinct occurrences, preserving the arrays. */
  def compact(b: QBuf): QBuf = {
    val bytes = QSketchKernel.serialize(b.ks, b.vs, b.n)
    val (ks, vs) = QSketchKernel.deserialize(bytes)
    System.arraycopy(ks, 0, b.ks, 0, ks.length)
    System.arraycopy(vs, 0, b.vs, 0, vs.length)
    b.copy(n = ks.length)
  }

  def mergeInto(a: QBuf, ks: Array[Long], vs: Array[Double]): QBuf = {
    var r = a
    var i = 0
    while (i < ks.length) { r = append(r, ks(i), vs(i)); i += 1 }
    r
  }
}

/** Build a quantile sketch from (tag, value) rows. NaN values are the
  * callers' null sentinel (parquet-safe, encoder-friendly) and are skipped
  * — SQL aggregate null semantics. */
class QSketchBuildAgg extends Aggregator[(Long, Double), QBuf, Array[Byte]] {
  override def zero: QBuf = QBuf.empty
  override def reduce(b: QBuf, in: (Long, Double)): QBuf =
    if (in._2.isNaN) b
    else QBuf.append(b, QSketchKernel.entryKey(in._1, in._2), in._2)
  override def merge(a: QBuf, b: QBuf): QBuf =
    QBuf.mergeInto(a, java.util.Arrays.copyOf(b.ks, b.n),
      java.util.Arrays.copyOf(b.vs, b.n))
  override def finish(b: QBuf): Array[Byte] =
    if (b.n == 0) null else QSketchKernel.serialize(b.ks, b.vs, b.n)
  override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

/** Union serialized sketches (bottom-k of the union of the inputs' sample
  * sets — exact mergeability of bottom-k sampling). Null inputs (groups
  * with no sketch yet, vacated-group reset rows) contribute nothing. */
class QSketchUnionAgg extends Aggregator[Array[Byte], QBuf, Array[Byte]] {
  override def zero: QBuf = QBuf.empty
  override def reduce(b: QBuf, in: Array[Byte]): QBuf =
    if (in == null) b
    else { val (ks, vs) = QSketchKernel.deserialize(in); QBuf.mergeInto(b, ks, vs) }
  override def merge(a: QBuf, b: QBuf): QBuf =
    QBuf.mergeInto(a, java.util.Arrays.copyOf(b.ks, b.n),
      java.util.Arrays.copyOf(b.vs, b.n))
  override def finish(b: QBuf): Array[Byte] =
    if (b.n == 0) null else QSketchKernel.serialize(b.ks, b.vs, b.n)
  override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}

/** Interpolated quantile `p` of a serialized [[QSketchKernel]] sketch —
  * the serve-side projection (group-sized frames; participates in
  * whole-stage codegen like the other native kernels). */
case class QSketchQuantile(child: Expression, p: Double)
    extends UnaryExpression {
  require(p >= 0.0 && p <= 1.0, s"quantile p must be in [0,1], got $p")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"qsketch_quantile requires binary sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qsketch_quantile"

  override def nullSafeEval(input: Any): Any =
    QSketchKernel.quantileBoxed(input.asInstanceOf[Array[Byte]], p)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r =
         |  graft.functions.QSketchKernel.quantileBoxed($b, $p);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QSketchQuantile =
    copy(child = newChild)
}

object QSketch {
  /** `qsketchBuild(tag, value)` aggregate column (value NaN = skip). */
  lazy val buildAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new QSketchBuildAgg)
  /** `unionAgg(sketch)` aggregate column over serialized sketches. */
  lazy val unionAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new QSketchUnionAgg)
  /** Scalar quantile estimate of a sketch column. */
  def quantile(sketch: Column, p: Double): Column =
    ColumnBridge.toColumn(QSketchQuantile(ColumnBridge.toExpression(sketch), p))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled md5-hash helpers shared by the native expressions and by
  * driver-side plan construction.
  *
  * Bit-compatibility contract (the whole point): for any string s,
  *   first8(s)  == the first 8 digest bytes as a big-endian long
  *   h60(s)     == first8 >>> 4
  *              == conv(substring(md5(s), 1, 15), 16, 10)   [Spark SQL]
  *              == CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT) [DuckDB]
  *   h1/h2      == hex digits 1-8 / 9-16 == first8 >>> 32 / first8 & 2^32-1
  * so every operator built on these stays oracle-checkable while the
  * interpreted conv/substring/md5 expression chain (~14 µs/element) becomes
  * one compiled digest + shift (~0.2 µs/element).
  */
object HashKernels {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def first8(bytes: Array[Byte]): Long = {
    val d = md.get(); d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
  }

  def first8(s: UTF8String): Long = first8(s.getBytes)

  /** 60-bit portable hash of a UTF-8 string (driver-side twin of hash60). */
  def h60(s: String): Long =
    first8(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 4

  def h60(s: UTF8String): Long = first8(s) >>> 4
}

/** array<string> → array<long>: hash60 of every element, fully compiled.
  * Value-identical to `transform(arr, s -> conv(substring(md5(s),1,15),16,10))`
  * for arrays without null elements; null elements are SKIPPED (dropped from
  * the output) rather than propagated — the output type is array<long> with
  * containsNull=false so downstream primitive kernels never see nulls. */
case class HashArray60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_array60 requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_array60"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0; var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { out(m) = HashKernels.h60(arr.getUTF8String(i)); m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$m++] = graft.functions.HashKernels.h60($a.getUTF8String($i));
         |  }
         |}
         |if ($m != $n) $out = java.util.Arrays.copyOf($out, $m);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashArray60 =
    copy(child = newChild)
}

object HashArray60 {
  def apply(arr: Column): Column =
    ColumnBridge.toColumn(HashArray60(ColumnBridge.toExpression(arr)))
}

/** array<string> → array<long>(perms): MinHash signature with md5 computed
  * inside the kernel. For each element: h1 = digest hex[1..8],
  * h2 = hex[9..16]; sig[i] = min (h1 + i·h2) mod prime. Value-identical to
  * the md5/conv/MinhashSignature chain and to the DuckDB oracle. Null
  * elements are skipped; an array with no non-null elements yields null
  * (a min over the empty set is undefined — same contract as
  * [[MinhashSignature]]). */
case class MinhashFromStrings(child: Expression, perms: Int, prime: Long)
    extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_str requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_str"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(perms)(Long.MaxValue)
    var k = 0; var seen = false
    while (k < n) {
      if (!arr.isNullAt(k)) {
        seen = true
        val f8 = HashKernels.first8(arr.getUTF8String(k))
        val x = f8 >>> 32; val y = f8 & 0xffffffffL
        var i = 0
        while (i < perms) {
          val v = (x + i * y) % prime
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      k += 1
    }
    if (!seen) null else new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val f8 = ctx.freshName("f8")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val v = ctx.freshName("v"); val sig = ctx.freshName("sig")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$perms];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k)) continue;
         |  $seen = true;
         |  long $f8 = graft.functions.HashKernels.first8($a.getUTF8String($k));
         |  long $x = $f8 >>> 32;
         |  long $y = $f8 & 0xffffffffL;
         |  for (int $i = 0; $i < $perms; $i++) {
         |    long $v = ($x + $i * $y) % ${prime}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashFromStrings =
    copy(child = newChild)
}

object MinhashFromStrings {
  def apply(arr: Column, perms: Int, prime: Long): Column =
    ColumnBridge.toColumn(MinhashFromStrings(ColumnBridge.toExpression(arr), perms, prime))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Inverted profile index for [[BestProfileIndex]]: the union of every
  * language's profile grams as one sorted hash60 postings array, with
  * `langs(k)` = the (ascending) language indices whose profile contains
  * `keys(k)`. ≤ langs·profileSize entries — kilobytes, shipped to executors
  * once as an expression reference object, never as codegen'd literals.
  */
final class ProfileIndex(val keys: Array[Long], val langs: Array[Array[Int]],
    val nLangs: Int) extends Serializable {

  /** Index of the language with the largest |doc grams ∩ profile| — one pass
    * over the doc's DISTINCT grams (hash + binary-search the ~100-entry
    * postings), ties to the smallest index (= lang asc when profiles are
    * sorted by language), −1 when every score is 0 (inner-join parity: such
    * docs produce no row in the join-based oracle formulation). Null gram
    * elements are skipped — same contract as the HashArray60 chain this
    * kernel replaces. */
  def bestIndex(grams: ArrayData): Int = {
    val counts = new Array[Int](nLangs)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val h = HashKernels.h60(grams.getUTF8String(i))
        val k = java.util.Arrays.binarySearch(keys, h)
        if (k >= 0) {
          val ls = langs(k)
          var j = 0
          while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    var best = 0; var bi = -1; var p = 0
    while (p < nLangs) {
      if (counts(p) > best) { best = counts(p); bi = p }
      p += 1
    }
    bi
  }
}

object ProfileIndex {
  /** Build from per-language sorted-distinct hash60 profiles (lang asc). */
  def apply(profiles: Array[Array[Long]]): ProfileIndex = {
    val byKey = scala.collection.mutable.TreeMap.empty[Long, List[Int]]
    for (p <- profiles.indices; h <- profiles(p))
      byKey(h) = byKey.getOrElse(h, Nil) :+ p
    new ProfileIndex(byKey.keys.toArray, byKey.values.map(_.toArray).toArray,
      profiles.length)
  }
}

/** array<string> (distinct grams) → int: index of the best-matching language
  * profile, null when no profile gram occurs in the document. Value-identical
  * to scoring `IntersectCardinality(sorted hash60s, profile)` per language
  * and taking argmax(score desc, index asc) — fused into ONE compiled kernel
  * call so the plan carries no per-language expression fan-out (whose
  * generated class grew with |langs| and dominated cold codegen+JIT time).
  */
case class BestProfileIndex(child: Expression, index: ProfileIndex)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"best_profile requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "best_profile"

  override def nullSafeEval(input: Any): Any = {
    val bi = index.bestIndex(input.asInstanceOf[ArrayData])
    if (bi < 0) null else bi
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("profileIndex", index,
      classOf[ProfileIndex].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val bi = ctx.freshName("bi")
      s"""
         |int $bi = $idx.bestIndex($a);
         |if ($bi < 0) { ${ev.isNull} = true; } else { ${ev.value} = $bi; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BestProfileIndex =
    copy(child = newChild)
}

object BestProfileIndex {
  def apply(grams: Column, profiles: Array[Array[Long]]): Column =
    ColumnBridge.toColumn(BestProfileIndex(
      ColumnBridge.toExpression(grams), ProfileIndex(profiles)))
}

/** array<string> → int: how many elements (counting MULTIPLICITY — this is
  * occurrence membership, not distinct intersection like
  * [[IntersectCardinality]]) hash into the given sorted hash60 set. The set
  * rides as a reference object (never codegen'd literals); each element
  * costs one digest + one binary search over the ~set-size longs. Null
  * elements are skipped. */
case class CountInSet(child: Expression, set: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_set requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  override def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashSet", set, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CountInSet.count($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def count(arr: ArrayData, set: Array[Long]): Int = {
    val n = arr.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, HashKernels.h60(arr.getUTF8String(i))) >= 0) c += 1
      i += 1
    }
    c
  }

  def apply(arr: Column, sortedSet: Array[Long]): Column =
    ColumnBridge.toColumn(CountInSet(ColumnBridge.toExpression(arr), sortedSet))
}

/** array<string> → array<string>: the elements whose hash60 is NOT in the
  * given sorted set, original order and multiplicity preserved (null
  * elements are dropped — the inputs this kernel sees are split() products,
  * which are never null). The filtering twin of [[CountInSet]]: same
  * reference-object set, one digest + binary search per element. Used for
  * boilerplate-line removal, where the frequent-line dictionary is the set
  * and each document keeps only its non-boilerplate lines. */
case class FilterNotInSet(child: Expression, set: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"filter_not_in_set requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "filter_not_in_set"

  override def nullSafeEval(input: Any): Any =
    FilterNotInSet.keep(input.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashSet", set, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FilterNotInSet.keep($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): FilterNotInSet =
    copy(child = newChild)
}

object FilterNotInSet {
  def keep(arr: ArrayData, set: Array[Long]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var i = 0; var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (java.util.Arrays.binarySearch(set, HashKernels.h60(s)) < 0) {
          out(m) = s; m += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  def apply(arr: Column, sortedSet: Array[Long]): Column =
    ColumnBridge.toColumn(FilterNotInSet(ColumnBridge.toExpression(arr), sortedSet))
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Levenshtein, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** The one place a custom `Rule[LogicalPlan]` earns its keep in this engine
  * (SURVEY.md §4.4: Catalyst's builtins cover every reference rewrite — so
  * the planner extension surface is used only where we have a strictly
  * better, bit-identical implementation of something users already write):
  *
  *  - `levenshtein(a, b)` → [[graft.functions.EditDistance]] (Myers
  *    bit-parallel; property-tested value-equal to the builtin)
  *  - `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)` — the
  *    engine-portable hash60 idiom — → [[graft.functions.Hash60]] (one
  *    compiled digest + shift; HashKernels' bit-compatibility contract)
  *
  * Both rewrites are pure expression substitutions: same value on every
  * input (including nulls — both kernels are null-intolerant unary/binary
  * expressions like the originals), tighter or equal nullability, same data
  * type. User-written SQL and Column code gets the fast kernels without
  * knowing they exist. Registered via `GraftExtensions`
  * (injectOptimizerRule for configured sessions, experimental
  * extraOptimizations for live ones).
  */
object KernelRewrites extends Rule[LogicalPlan] {

  private def isLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, _) => x == v
    case _ => false
  }

  /** `md5(stringCol)` analyzes as Md5(Cast(col, BinaryType)): unwrap to the
    * string argument our kernel digests (UTF-8 bytes — identical input). */
  private def md5StringArg(e: Expression): Option[Expression] = e match {
    case Md5(c: Cast) if c.dataType == BinaryType && c.child.dataType == StringType =>
      Some(c.child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case l: Levenshtein if l.threshold.isEmpty =>
      graft.functions.EditDistance(l.left, l.right)
    case c: Cast if c.dataType == LongType =>
      c.child match {
        case conv: Conv if isLit(conv.fromBaseExpr, 16) && isLit(conv.toBaseExpr, 10) =>
          conv.numExpr match {
            case ss: Substring if isLit(ss.pos, 1) && isLit(ss.len, 15) =>
              md5StringArg(ss.str) match {
                case Some(s) => graft.functions.Hash60(s)
                case None => c
              }
            case _ => c
          }
        case _ => c
      }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite threshold comparisons over the UNBOUNDED
  * `levenshtein(l, r)` into the early-exit bounded form
  * `levenshtein(l, r, k) >= 0`.
  *
  * Users naturally write `WHERE levenshtein(a, b) <= 3` — which computes
  * the full O(|a|·|b|) dynamic program per pair, then throws almost all
  * of it away. Spark's 3-arg `levenshtein(l, r, threshold)` abandons a
  * pair as soon as the running distance exceeds the threshold (returning
  * -1), costing O(min(|a|,|b|)·k). Catalyst performs no such rewrite, so
  * on a fuzzy-linkage join over 100 TB the difference is the whole
  * runtime of the pairing stage (k is small; strings are not).
  *
  * Equivalences used (distance is always >= 0, and the bounded form
  * returns -1 iff distance > k; null inputs yield null on both sides of
  * every rewrite, so three-valued logic is preserved):
  *   lev(l,r) <= k   ⇔  lev(l,r,k)   >= 0      (k >= 0)
  *   lev(l,r) <  k   ⇔  lev(l,r,k-1) >= 0      (k >= 1)
  *   lev(l,r) == k   ⇔  lev(l,r,k)   == k      (k >= 0)
  * plus the mirrored `k >= lev(l,r)` / `k > lev(l,r)` orientations.
  *
  * The rule only fires on `threshold = None`, so it is idempotent.
  * Registered via `GraftFunctions.register` (experimental methods) and
  * `GraftExtensions` (spark.sql.extensions).
  */
object BoundLevenshtein extends Rule[LogicalPlan] {

  /** An unbounded levenshtein, possibly under the integral-widening Cast
    * the analyzer inserts when the comparison literal is a long
    * (`lev(a,b) <= 3L` analyzes to `Cast(lev, LongType) <= 3L`) — without
    * unwrapping, exactly the queries this rule targets silently keep the
    * O(n²) path. Dropping the cast is safe: the rewritten comparison is
    * int-vs-int with identical semantics. */
  private object UnboundedLev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(l, r, None) => Some((l, r))
      case Cast(Levenshtein(l, r, None), LongType, _, _) => Some((l, r))
      case _ => None
    }
  }

  /** Int-valued literal threshold (int or exactly-representable long). */
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(k: Int, IntegerType) => Some(k)
      case Literal(k: Long, LongType)
          if k >= Int.MinValue && k <= Int.MaxValue => Some(k.toInt)
      case _ => None
    }
  }

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // lev <= k  /  k >= lev
    case LessThanOrEqual(UnboundedLev(l, r), IntLit(k)) if k >= 0 =>
      bounded(l, r, k)
    case GreaterThanOrEqual(IntLit(k), UnboundedLev(l, r)) if k >= 0 =>
      bounded(l, r, k)
    // lev < k  /  k > lev
    case LessThan(UnboundedLev(l, r), IntLit(k)) if k >= 1 =>
      bounded(l, r, k - 1)
    case GreaterThan(IntLit(k), UnboundedLev(l, r)) if k >= 1 =>
      bounded(l, r, k - 1)
    // lev == k — bounded form returns the true distance iff it is <= k
    case EqualTo(UnboundedLev(l, r), IntLit(k)) if k >= 0 =>
      EqualTo(Levenshtein(l, r, Some(Literal(k))), Literal(k))
    case EqualTo(IntLit(k), UnboundedLev(l, r)) if k >= 0 =>
      EqualTo(Levenshtein(l, r, Some(Literal(k))), Literal(k))
  }
}

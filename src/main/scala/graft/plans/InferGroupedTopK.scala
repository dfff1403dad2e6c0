package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst rewrite: the declarative grouped-top-k spelling
  *
  *   `filter(row_number() OVER (PARTITION BY g ORDER BY s) <= k)`
  *
  * becomes the [[GroupedTopKNode]] heap operator. Users (and this
  * repo's own operators) keep writing the standard window idiom; the
  * plan they get is partial-heap → k-bounded shuffle → final-heap
  * instead of full-corpus exchange + per-partition sort (+
  * WindowGroupLimit, which trims after the sort but still pays it and
  * still ships every row). Rank semantics are preserved: the rewritten
  * node emits the surviving rows' 1-based in-group rank under the same
  * attribute, so downstream references (`rank` kept in the output, or
  * residual predicates on it) bind unchanged.
  *
  * Fires only on the exact-single-rank-function shape:
  *   - one window expression, `row_number()` or `rank()` (the latter
  *     maps to the node's ties-kept mode — `rank() <= k` keeps boundary
  *     ties, so a group may emit more than k rows, exactly like the
  *     window spelling), non-empty PARTITION BY and ORDER BY (a global
  *     top-k has no partition to cluster on and stays a window);
  *   - at least one conjunct bounding the rank by an integer literal
  *     (`rn <= k`, `rn < k`, `rn = 1`, or the flipped spellings); the
  *     tightest bound wins, other conjuncts stay in a residual Filter
  *     above (they may keep referencing the rank);
  *   - batch plan (heaps keep per-group state; the streaming analog is
  *     a different operator).
  *
  * Ties: `row_number` over a non-total order is already
  * partition-order-dependent in vanilla Spark; the rewrite keeps that
  * contract (an arbitrary consistent choice among boundary ties).
  * Every gated query in this repo orders by a total key per the
  * engine's window conventions, so results are bit-identical there.
  */
object InferGroupedTopK extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** k such that the conjunct is exactly `rank <= k`, else None. */
  private def bound(c: Expression, rn: Attribute): Option[Int] = c match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** Kill switch: `SET spark.graft.topk.rewrite=false` keeps the plain
    * window plan (escape hatch for plan-shape debugging / A-B timing).
    */
  private def enabled: Boolean =
    conf.getConfString("spark.graft.topk.rewrite", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(fn, _), _)),
          part, order, child, _))
        if part.nonEmpty && order.nonEmpty && !w.isStreaming &&
          (fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank]) =>
      // rank() <= k keeps boundary ties (a group may emit > k rows) —
      // the node's ties mode; row_number() <= k is the strict heap path
      val ties = fn.isInstanceOf[Rank]
      val rn = alias.toAttribute
      val cs = conjuncts(cond)
      val bounds = cs.flatMap(c => bound(c, rn).map(k => (c, k)))
      val k = if (bounds.isEmpty) 0 else bounds.map(_._2).min
      if (k <= 0) f // no usable bound (or a statically-empty filter)
      else {
        val consumed = bounds.filter(_._2 == k).map(_._1).take(1).toSet
        val residual = cs.filterNot(consumed)
        val node = GroupedTopKNode(part, order, k, child,
          rankAttr = Some(rn), ties = ties)
        residual.reduceOption(And).map(Filter(_, node)).getOrElse(node)
      }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualNullSafe, Expression, UnboundedFollowing, UnboundedPreceding, SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, CollectSet, Count, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Catalyst rewrite: whole-partition AGGREGATE windows
  *
  *   `sum(x) OVER (PARTITION BY k)`   (frame unbounded ↔ unbounded)
  *
  * become a partial-aggregated census joined back to the rows:
  *
  *   `rows JOIN (rows GROUP BY k AGG sum(x)) ON k <=> k`
  *
  * The window spelling is the natural way to write "attach the group
  * statistic to every row" — and it is THE scale trap of WindowExec:
  * a full-corpus exchange, a per-partition SORT the unbounded frame
  * never needed, and whole-partition ROW BUFFERING (one marathon key =
  * one executor OOM). The rewritten plan partial-aggregates map-side
  * to census grain, never sorts, holds O(groups) state, and when the
  * census is small the join side broadcasts — the raw rows then never
  * shuffle at all. The cost is reading the child twice (linear,
  * spill-free) — the right trade at any scale where the buffer
  * matters; `SET spark.graft.window.rewrite=false` restores the
  * WindowExec plan.
  *
  * Fires only when EVERY window expression in the node is safe:
  *  - an aggregate (no rank/lead/lag — those genuinely need order),
  *    non-DISTINCT, unfiltered, deterministic;
  *  - frame = (UNBOUNDED PRECEDING, UNBOUNDED FOLLOWING) — with any
  *    ORDER BY (the result is order-free over that frame, the sort is
  *    pure waste; the default CURRENT-ROW frame an ORDER BY implies
  *    does NOT match);
  *  - the function's merge is association-order-free so the groupBy
  *    plan is value-identical to the window plan: count / min / max,
  *    sum & avg over integral/decimal inputs (long overflow wraps
  *    identically — modular; DOUBLE sums are excluded: reassociation
  *    would change low bits), HLL++ (register maxes commute),
  *    collect_set (set semantics — element ORDER is unspecified in
  *    both spellings; size/contains survive, order-sensitive reads of
  *    an unordered set were already broken).
  *
  * Empty PARTITION BY (the "subtract the global mean" shape — the
  * absolute worst case for WindowExec: the ENTIRE input in one task)
  * rewrites to a cross join against the 1-row global aggregate, which
  * the planner broadcasts.
  *
  * NULL partition keys group together in both spellings — the join
  * uses null-safe equality. Output attribute ids are restored via
  * aliases, so parent references bind unchanged. The aggregate side's
  * outputs are all fresh, keeping the self-join's outputs disjoint.
  */
object RewriteWholePartitionWindow extends Rule[LogicalPlan] {

  /** Kill switch: `SET spark.graft.window.rewrite=false` keeps
    * WindowExec (escape hatch for plan-shape debugging / A-B timing).
    */
  private def enabled: Boolean =
    conf.getConfString("spark.graft.window.rewrite", "true").toBoolean

  private def orderFree(fn: AggregateFunction): Boolean = fn match {
    case s: Sum => exactSumType(s.child.dataType)
    case a: Average => exactSumType(a.child.dataType)
    case _: Count | _: Min | _: Max => true
    case _: HyperLogLogPlusPlus => true
    case _: CollectSet => true
    case _ => false
  }

  private def exactSumType(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }

  private def wholePartition(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else plan.transform {
      case w @ Window(exprs, parts, _, child, _)
          if !w.isStreaming && exprs.nonEmpty &&
            parts.forall(_.deterministic) &&
            exprs.forall {
              case Alias(WindowExpression(ae: AggregateExpression, spec), _) =>
                !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
                  orderFree(ae.aggregateFunction) && wholePartition(spec) &&
                  spec.partitionSpec == parts
              case _ => false
            } =>
        val keyAliases = parts.zipWithIndex.map { case (p, i) =>
          Alias(p, s"_gwk$i")()
        }
        val aggAliases = exprs.map {
          case Alias(WindowExpression(ae, _), name) => Alias(ae, name)()
        }
        val agg = Aggregate(parts, keyAliases ++ aggAliases, child)
        val cond = parts.zip(keyAliases)
          .map { case (p, k) => EqualNullSafe(p, k.toAttribute): Expression }
          .reduceOption(And)
        val join = Join(child, agg,
          if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)
        val restored = exprs.zip(aggAliases).map { case (orig, fresh) =>
          Alias(fresh.toAttribute, orig.name)(exprId = orig.exprId)
        }
        Project(child.output ++ restored, join)
    }
}

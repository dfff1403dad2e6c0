package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, EqualNullSafe, ExprId, Expression, NamedExpression, Size, SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
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
  *
  * SIZE-FUSION: `size(collect_set(x) OVER w)` — the exact windowed
  * distinct-count spelling (Spark rejects DISTINCT window functions,
  * so this is how users write it) — fuses to `count(DISTINCT x)` in
  * the census when the set is consumed ONLY via size(): the join then
  * ships an 8-byte count per group instead of the materialized set
  * (a hot key's set is unbounded — the count is not). A set also
  * consumed raw keeps the collect_set aggregate.
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

  /** The rewrite scans `w.child` twice (row side + census side); a
    * non-deterministic child would make the group statistics come from a
    * different evaluation than the rows they're attached to, where
    * WindowExec computes both from a single materialization. Bail.
    */
  private def childDeterministic(w: Window): Boolean =
    w.child.find(p => p.expressions.exists(!_.deterministic)).isEmpty

  private def eligible(w: Window): Boolean =
    !w.isStreaming && w.windowExpressions.nonEmpty &&
      childDeterministic(w) &&
      w.partitionSpec.forall(_.deterministic) &&
      w.windowExpressions.forall {
        case Alias(WindowExpression(ae: AggregateExpression, spec), _) =>
          !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
            orderFree(ae.aggregateFunction) && wholePartition(spec) &&
            spec.partitionSpec == w.partitionSpec
        case _ => false
      }

  /** ids of collect_set window expressions (the size-fusion candidates). */
  private def collectSetIds(w: Window): Seq[ExprId] =
    w.windowExpressions.collect {
      case a @ Alias(WindowExpression(ae: AggregateExpression, _), _)
          if ae.aggregateFunction.isInstanceOf[CollectSet] => a.exprId
    }

  /** Does `e` reference attribute `id` anywhere EXCEPT as the direct
    * child of size(...)?
    */
  private def usedOutsideSize(e: Expression, id: ExprId): Boolean = e match {
    case Size(a: Attribute, _) if a.exprId == id => false
    case a: Attribute => a.exprId == id
    case other => other.children.exists(usedOutsideSize(_, id))
  }

  /** The census + null-safe join for `w`. Window expressions whose id is
    * in `fuse` (collect_set consumed only via size) aggregate as
    * count(DISTINCT child) instead of materializing the set. Returns the
    * join, the original-id restore aliases for NON-fused expressions,
    * and the fused-id -> count-attribute map.
    */
  private def rewrite(w: Window, fuse: Set[ExprId])
      : (LogicalPlan, Seq[NamedExpression], Map[ExprId, Attribute]) = {
    val exprs = w.windowExpressions
    val parts = w.partitionSpec
    val child = w.child
    val keyAliases = parts.zipWithIndex.map { case (p, i) =>
      Alias(p, s"_gwk$i")()
    }
    val aggAliases = exprs.map {
      case a @ Alias(WindowExpression(ae: AggregateExpression, _), name) =>
        if (fuse(a.exprId)) {
          val cs = ae.aggregateFunction.asInstanceOf[CollectSet]
          Alias(AggregateExpression(Count(Seq(cs.child)),
            org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
            isDistinct = true), s"${name}_dcnt")()
        } else Alias(ae, name)()
    }
    val agg = Aggregate(parts, keyAliases ++ aggAliases, child)
    val cond = parts.zip(keyAliases)
      .map { case (p, k) => EqualNullSafe(p, k.toAttribute): Expression }
      .reduceOption(And)
    val join = Join(child, agg,
      if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)
    val restored = exprs.zip(aggAliases).collect {
      case (orig, fresh) if !fuse(orig.exprId) =>
        Alias(fresh.toAttribute, orig.name)(exprId = orig.exprId)
    }
    val fusedMap = exprs.zip(aggAliases).collect {
      case (orig, fresh) if fuse(orig.exprId) =>
        orig.exprId -> fresh.toAttribute
    }.toMap
    (join, restored, fusedMap)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else plan.transform {
      // size(collect_set(x) OVER w) with the set consumed ONLY via size:
      // the census aggregates count(DISTINCT x) — the distinct COUNT
      // ships through the join, never the set itself
      case p @ Project(fields, w: Window)
          if eligible(w) && {
            val cands = collectSetIds(w)
            cands.nonEmpty && cands.exists(id =>
              !fields.exists(f => usedOutsideSize(f, id)))
          } =>
        val fuse = collectSetIds(w).filter(id =>
          !fields.exists(f => usedOutsideSize(f, id))).toSet
        val (join, restored, fusedMap) = rewrite(w, fuse)
        val inner = Project(
          w.child.output ++ restored ++ fusedMap.values.toSeq, join)
        val newFields = fields.map(_.transform {
          case Size(a: Attribute, _) if fusedMap.contains(a.exprId) =>
            Cast(fusedMap(a.exprId), IntegerType)
        }.asInstanceOf[NamedExpression])
        Project(newFields, inner)

      case w: Window if eligible(w) =>
        val (join, restored, _) = rewrite(w, Set.empty)
        Project(w.child.output ++ restored, join)
    }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, LessThan, LessThanOrEqual, Literal, Not, Remainder, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Catalyst rewrite: the naive range-join spelling
  *
  *   `points.join(intervals, p >= s && p < e)`        (and the >, <=,
  *                                                     flipped variants)
  *
  * becomes a bucketed EQUI-join. Spark has no range-join strategy — a
  * join whose condition has no equality conjunct plans as
  * BroadcastNestedLoopJoin (small side) or cartesian (neither side
  * broadcastable): O(|P|·|I|) either way, the classic silent
  * scale-killer of event-interval workloads. [[graft.operators
  * .RangeJoin.bucketed]] is the hand-built fix; this rule applies the
  * SAME transformation to the spelling every user actually writes:
  * explode each interval into the fixed-width buckets it overlaps,
  * bucket each point once (sign-safe floor division), hash-join on the
  * bucket, keep the ORIGINAL predicate as the residual — each matching
  * pair meets in exactly one bucket (the point's), so no dedup pass.
  * Interval rows whose bounds are unsatisfiable (e ≤ s, resp. e < s
  * for the inclusive spelling) are filtered before the explode — they
  * cannot match under the original condition, and an inverted
  * `sequence()` would otherwise fabricate a descending bucket range.
  *
  * OPT-IN by width: fires only when
  * `spark.graft.rangejoin.bucketWidth` is a positive long — the bucket
  * width is data-dependent by nature (pick it near the typical
  * interval span so the per-interval explode factor stays O(1)), which
  * is exactly why Spark cannot plan this generically and the knob must
  * come from the user. Width 0 (default) = rule off.
  *
  * EXPLODE CAP (`spark.graft.rangejoin.maxBuckets`, default 4096):
  * intervals spanning more buckets than the cap — open-ended sentinel
  * bounds being the real-world case — are routed by a span filter to a
  * fallback branch that keeps the ORIGINAL un-exploded join, and the
  * two branches union. Without the cap one sentinel row makes
  * `sequence()` attempt billions of elements (hard failure or OOM)
  * where the original nested-loop join was merely slow. The fallback
  * costs one extra scan of the points side in the static plan, but
  * with AQE on (the engine default) an EMPTY wide-interval side —
  * the common case — collapses the fallback join to an empty relation
  * at runtime, pruning that scan entirely. The sequence's end bound
  * additionally collapses to the start for wide rows (an If on the
  * span predicate) so the inferred size(sequence(...)) > 0 Generate
  * filter can never evaluate a giant sequence regardless of conjunct
  * order.
  *
  * Fires only on: batch INNER joins, no existing cross-side equality
  * conjunct (those already hash-join; also makes the rewrite
  * idempotent — its own output joins on the bucket equality), integral
  * point/bound types, and both bounds referencing the same point
  * expression with both interval bounds on the opposite side. Null
  * keys behave identically (null comparisons never matched; null
  * buckets never equi-match; a null-bound interval explodes to zero
  * rows it could never have matched).
  */
object InferBucketedRangeJoin extends Rule[LogicalPlan] {

  private def width: Long =
    conf.getConfString("spark.graft.rangejoin.bucketWidth", "0").toLong

  /** Per-interval explode cap. One open-ended/sentinel interval (e.g.
    * e = Long.MaxValue) against a small width would otherwise ask
    * `sequence()` for billions of elements — a hard failure (sequence
    * length cap) or OOM where the original nested-loop join was merely
    * slow. Intervals spanning more than this many buckets are routed,
    * by a span filter, to a FALLBACK branch that keeps the original
    * un-exploded join; the two branches union. ≤ 0 disables the cap
    * (every interval explodes).
    */
  private def maxBuckets: Long =
    conf.getConfString("spark.graft.rangejoin.maxBuckets", "4096").toLong

  /** The fallback branch keeps a join with no cross-side equality — the
    * exact shape this rule matches — so without a guard the rewrite
    * would re-fire on its own output every fixed-point pass until the
    * optimizer's max-iterations error. The guard is structural: the
    * fallback (and narrow) interval side carries a span filter built
    * around `Cast(IntegralDivide(…), Double)` — a shape nothing else in
    * the engine or in user predicates produces (users write arithmetic
    * on values, not double-cast integral divisions of them) — and the
    * filter is semantically load-bearing, so no later rule can remove
    * it. Conservative by construction: a false positive only means the
    * rule declines to fire.
    */
  private def hasSpanGuard(p: LogicalPlan): Boolean =
    p.collectFirst {
      case f: Filter if f.condition.exists {
        case Cast(e, DoubleType, _, _) =>
          e.exists { case _: IntegralDivide => true; case _ => false }
        case _ => false
      } => f
    }.isDefined

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Wrap-safe floor division: truncating `div`, minus 1 when the
    * dividend is negative with a nonzero remainder. The previous
    * `(a − pmod(a, w)) div w` spelling wrapped for values in the lowest
    * width-band above Long.MinValue (silently wrong bucket in non-ANSI
    * mode, runtime error under ANSI); `a div w` with w > 0 cannot
    * overflow anywhere in the long domain, and the −1 adjustment only
    * fires when `a div w > Long.MinValue`.
    */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val al = asLong(a)
    val q = IntegralDivide(al, Literal(w))
    val adj = If(
      And(LessThan(al, Literal(0L)),
        Not(EqualTo(Remainder(al, Literal(w)), Literal(0L)))),
      Literal(1L), Literal(0L))
    Subtract(q, adj)
  }

  // which input a pure one-side expression belongs to
  private sealed trait Side
  private case object L extends Side
  private case object R extends Side

  private def sideOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[Side] = {
    val inL = e.references.subsetOf(left.outputSet)
    val inR = e.references.subsetOf(right.outputSet)
    if (inL && !inR && e.references.nonEmpty) Some(L)
    else if (inR && !inL && e.references.nonEmpty) Some(R)
    else None
  }

  /** (point, bound, pointSide) for `point >= bound` / `point > bound`
    * spellings — strict lower bounds are safe to treat loosely: bucket
    * coverage from floor(s/w) is a superset, the residual re-checks.
    */
  private def lower(c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Side)] = {
    val pair = c match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case GreaterThan(p, s) => Some((p, s))
      case LessThanOrEqual(s, p) => Some((p, s))
      case LessThan(s, p) => Some((p, s))
      case _ => None
    }
    pair.flatMap { case (p, s) =>
      (sideOf(p, left, right), sideOf(s, left, right)) match {
        case (Some(ps), Some(ss)) if ps != ss && integral(p) && integral(s) =>
          Some((p, s, ps))
        case _ => None
      }
    }
  }

  /** (point, bound, inclusive, pointSide) for `point < e` / `point <= e`. */
  private def upper(c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Boolean, Side)] = {
    val trip = c match {
      case LessThan(p, e) => Some((p, e, false))
      case LessThanOrEqual(p, e) => Some((p, e, true))
      case GreaterThan(e, p) => Some((p, e, false))
      case GreaterThanOrEqual(e, p) => Some((p, e, true))
      case _ => None
    }
    trip.flatMap { case (p, e, inc) =>
      (sideOf(p, left, right), sideOf(e, left, right)) match {
        case (Some(ps), Some(es)) if ps != es && integral(p) && integral(e) =>
          Some((p, e, inc, ps))
        case _ => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.left.isStreaming && !j.right.isStreaming =>
        val cs = conjuncts(cond)
        val hasCrossEqui = cs.exists {
          case EqualTo(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case _ => false
        }
        val pair = if (hasCrossEqui || hasSpanGuard(left) || hasSpanGuard(right)) None
        else {
          val los = cs.flatMap(lower(_, left, right))
          val ups = cs.flatMap(upper(_, left, right))
          los.flatMap { case (p, s, ps) =>
            ups.collectFirst {
              case (p2, e, inc, ps2)
                  if ps == ps2 && p.semanticEquals(p2) => (p, s, e, inc, ps)
            }
          }.headOption
        }
        pair match {
          case None => j
          case Some((p, s, e, inclusive, pSide)) =>
            val maxB = maxBuckets
            val (points, intervals) = pSide match {
              case L => (left, right)
              case R => (right, left)
            }
            val pBkt = Alias(floorDiv(p, w), "_graft_bkt_p")()
            val pProj = Project(points.output :+ pBkt, points)
            val satisfiable =
              if (inclusive) GreaterThanOrEqual(asLong(e), asLong(s))
              else GreaterThan(asLong(e), asLong(s))
            val eAdj = if (inclusive) asLong(e)
              else Subtract(asLong(e), Literal(1L))
            // Span-in-buckets as a DOUBLE difference: wrap-free for any
            // bound pair (a long subtraction could overflow on
            // sentinel-vs-negative bounds), deterministic, and only a
            // ROUTING decision — both branches compute identical
            // results, the residual predicate re-checks every pair — so
            // double rounding at the boundary is harmless. Null-bound
            // intervals fail BOTH the narrow predicate and its
            // negation, dropping from both branches: correct, since a
            // null bound never satisfies the original comparison.
            val spanNarrow = LessThan(
              Subtract(Cast(floorDiv(eAdj, w), DoubleType),
                Cast(floorDiv(s, w), DoubleType)),
              Literal(maxB.toDouble))
            // Sequence is TimeZoneAwareExpression: without an explicit
            // zone it stays unresolved (ResolveTimeZone already ran).
            // The end bound COLLAPSES TO THE START for wide rows (an
            // If on the span predicate): the span Filter already drops
            // them, but InferFiltersFromGenerate infers a
            // size(sequence(...)) > 0 conjunct into the SAME Filter
            // with no guaranteed evaluation order against the span
            // conjunct — an unclamped sequence() on a sentinel
            // interval would throw its length cap from inside that
            // inferred predicate before the span filter ever ran.
            val seqEnd =
              if (maxB <= 0) floorDiv(eAdj, w)
              else If(spanNarrow, floorDiv(eAdj, w), floorDiv(s, w))
            val bkts = Alias(
              Sequence(floorDiv(s, w), seqEnd, None,
                Some(conf.sessionLocalTimeZone)), "_graft_bkts")()
            def branch(extraFilter: Option[Expression]): LogicalPlan = {
              val filt = extraFilter
                .map(And(satisfiable, _)).getOrElse(satisfiable)
              val iProj = Project(intervals.output :+ bkts.newInstance(),
                Filter(filt, intervals))
              val bAttr = iProj.projectList.last.toAttribute
              val iBkt = AttributeReference("_graft_bkt_i", LongType,
                nullable = true)()
              val gen = Generate(Explode(bAttr), Seq.empty,
                outer = false, qualifier = None,
                generatorOutput = Seq(iBkt), child = iProj)
              val newCond = And(EqualTo(pBkt.toAttribute, iBkt), cond)
              val (nl, nr) = pSide match {
                case L => (pProj: LogicalPlan, gen: LogicalPlan)
                case R => (gen: LogicalPlan, pProj: LogicalPlan)
              }
              Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
            }
            // The Union fallback scans `points` and `intervals` in TWO
            // branches under complementary span filters; with a
            // non-deterministic child a row could land in both branches
            // (duplicate) or neither (drop), where the single-branch
            // plan scans each side once. Determinism also matters for
            // the narrow branch alone: `intervals` feeds both the
            // Filter and (via Generate) the join, but that is one
            // linear scan — only the DUAL-scan Union is unsafe.
            val childrenDeterministic =
              points.find(p => p.expressions.exists(!_.deterministic)).isEmpty &&
                intervals.find(p => p.expressions.exists(!_.deterministic)).isEmpty
            if (maxB <= 0) branch(None)
            else if (!childrenDeterministic) j
            else {
              // wide (≥ maxB buckets) intervals keep the ORIGINAL
              // un-exploded join — slow but bounded, never a
              // billion-element sequence(); hasSpanGuard keeps this
              // branch from re-matching on the next fixed-point pass
              val wideJoin = {
                val iWide = Filter(And(satisfiable, Not(spanNarrow)),
                  intervals)
                val (nl, nr) = pSide match {
                  case L => (points, iWide: LogicalPlan)
                  case R => (iWide: LogicalPlan, points)
                }
                Project(j.output, Join(nl, nr, Inner, Some(cond), hint))
              }
              logInfo(s"range-join rewrite on ${j.simpleString(40)}: " +
                s"intervals spanning >= $maxB buckets routed to a " +
                "fallback nested-loop branch (spark.graft.rangejoin.maxBuckets)")
              Union(Seq(branch(Some(spanNarrow)), wideJoin))
            }
        }
    }
  }
}

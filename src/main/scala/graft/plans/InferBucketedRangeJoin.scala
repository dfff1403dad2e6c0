package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, Pmod, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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

  /** Sign-safe floor division: (a − pmod(a, w)) div w. */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val al = asLong(a)
    IntegralDivide(Subtract(al, Pmod(al, Literal(w))), Literal(w))
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
        val pair = if (hasCrossEqui) None
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
            // Sequence is TimeZoneAwareExpression: without an explicit
            // zone it stays unresolved (ResolveTimeZone already ran)
            val bkts = Alias(
              Sequence(floorDiv(s, w), floorDiv(eAdj, w), None,
                Some(conf.sessionLocalTimeZone)), "_graft_bkts")()
            val iProj = Project(intervals.output :+ bkts,
              Filter(satisfiable, intervals))
            val iBkt = AttributeReference("_graft_bkt_i", LongType,
              nullable = true)()
            val gen = Generate(Explode(bkts.toAttribute), Seq.empty,
              outer = false, qualifier = None,
              generatorOutput = Seq(iBkt), child = iProj)
            val newCond = And(EqualTo(pBkt.toAttribute, iBkt), cond)
            val (nl, nr) = pSide match {
              case L => (pProj: LogicalPlan, gen: LogicalPlan)
              case R => (gen: LogicalPlan, pProj: LogicalPlan)
            }
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
    }
  }
}

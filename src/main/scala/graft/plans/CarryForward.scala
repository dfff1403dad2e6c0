package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Single-pass last-non-null carry within key groups — the physical
  * core of the as-of join ([[graft.operators.AsOf]]), as a first-class
  * operator instead of a window.
  *
  * The window spelling — `last(_carry, ignoreNulls) OVER (PARTITION BY
  * key ORDER BY t, side ROWS UNBOUNDED PRECEDING)` — plans as
  * Exchange + Sort + `WindowExec`, and WindowExec BUFFERS each
  * partition-by group in an `ExternalAppendOnlyUnsafeRowArray` before
  * emitting (spilling past 4096 rows): a running last-value needs none
  * of that. This operator declares the same distribution + ordering
  * requirements (so EnsureRequirements plans the identical exchange
  * and sort) and then streams each sorted partition ONCE with O(1)
  * state — the current key and the last non-null carry — no buffering,
  * no spill, no per-frame evaluator machinery. On a 100 TB log the
  * sort is unavoidable either way; the group buffer is pure waste and
  * is exactly what breaks on marathon keys (every event of a bot user
  * in memory at once).
  *
  * FORWARD as-of ("first non-null in current..following") is the same
  * pass under the REVERSED order — the node's `order` simply arrives
  * descending — so one exec serves both join directions.
  *
  * The carry column is REPLACED in place (output = child output, same
  * attribute ids). Catalyst treats the node as an optimization
  * barrier for expression pushdown (no PushDownPredicate rule knows
  * it), which is required: a predicate on the carry column refers to
  * the POST-carry value.
  */
case class CarryForwardNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    carry: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "carry-forward needs at least one key")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): CarryForwardNode =
    copy(child = newChild)
}

object CarryForwardStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CarryForwardNode(keys, order, carry, child) =>
      CarryForwardExec(keys, order, carry, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class CarryForwardExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    carry: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def producedAttributes: AttributeSet = AttributeSet.empty

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (keys.map(SortOrder(_, Ascending)) ++ order) :: Nil
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keysLoc = keys
    val childOut = child.output
    val carryIdx = childOut.indexWhere(_.exprId == carry.exprId)
    require(carryIdx >= 0, s"carry column $carry not in child output")
    val carryType = carry.dataType
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLoc, childOut)
      // output row = child row with the carry ordinal read from the
      // state slot (appended as a 1-field row behind the child row)
      val outProj = UnsafeProjection.create(
        childOut.zipWithIndex.map { case (a, i) =>
          if (i == carryIdx)
            BoundReference(childOut.length, carryType, nullable = true)
          else BoundReference(i, a.dataType, a.nullable)
        }, childOut :+ carry)
      val joined = new JoinedRow
      val stateRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      iter.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          stateRow.update(0, null)
        }
        if (!row.isNullAt(carryIdx)) {
          // InternalRow.get copies nothing — copy so the state survives
          // the row buffer's reuse
          stateRow.update(0, InternalRow.copyValue(row.get(carryIdx, carryType)))
        }
        numOutputRows += 1
        outProj(joined(row, stateRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): CarryForwardExec =
    copy(child = newChild)
}

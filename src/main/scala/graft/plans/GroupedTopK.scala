package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Grouped top-k as a first-class operator: logical node + planner
  * strategy + heap-based physical operator, registered through
  * `SparkSessionExtensions` ([[graft.session.GraftExtensions]]).
  *
  * The declarative spelling — `row_number() OVER (PARTITION BY g ORDER
  * BY s) <= k` — plans as Exchange(ALL rows) + per-partition full SORT
  * (+ `WindowGroupLimit`, which trims after sorting but still sorts and
  * still ships every row through the shuffle). At 100 TB both costs are
  * the bottleneck: the shuffle moves the whole corpus and the sort pays
  * O(n log n) per partition for an answer that only needs k rows per
  * group.
  *
  * This operator is the aggregation-shaped plan instead:
  *
  *   - PARTIAL pass (map side, before any exchange): one bounded
  *     max-heap per group seen in the input partition — O(n log k),
  *     no sort. At most k rows per (group × input partition) survive
  *     into the shuffle, the same volume contract as a partial
  *     aggregate's combine. Memory is self-limiting: when the retained
  *     set exceeds a flush threshold the pass emits and resets — always
  *     correct, because the FINAL pass re-selects (exactly the partial
  *     aggregation spill contract, but without sorting).
  *   - Exchange clusters by the group keys — `EnsureRequirements`
  *     inserts it from the final node's required distribution; AQE can
  *     still coalesce/split it.
  *   - FINAL pass: same heaps at group grain; holds ≤ k rows per group
  *     (strictly less state than `WindowExec`, which buffers whole
  *     groups), emits each group's k rows in order.
  *
  * Exactness requires the usual top-k contract: `order` must be a total
  * order (tie-break on a unique column) or boundary ties are
  * partition-dependent — the gates order by (metric, unique id).
  */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k > 0, s"grouped top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Plans [[GroupedTopKNode]] as final(exchange(partial(child))) — the
  * exchange itself is left to `EnsureRequirements` (final's required
  * child distribution), so AQE and reuse see a normal shuffle.
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, o, k, child, rank) =>
      val partial = GroupedTopKExec(g, o, k, partial = true, planLater(child))
      GroupedTopKExec(g, o, k, partial = false, partial, rank) :: Nil
    case _ => Nil
  }
}

/** Heap-per-group physical top-k. `partial = true` is the map-side
  * combine (any distribution, flush-on-pressure); `partial = false`
  * requires clustering on `groupExprs` and is exact. When `rankAttr`
  * is set (final only), each group's rows additionally carry their
  * 1-based in-group rank under `order` — the `row_number` the
  * [[InferGroupedTopK]] rewrite replaces.
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Partial-pass memory ceiling in retained rows; exceeding it emits
    * the current heaps and resets (correct under final re-selection).
    */
  private val flushRows: Int = if (partial) 4 * 1024 * 1024 else Int.MaxValue

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val kLoc = k
    val flushLoc = flushRows
    val groupLoc = groupExprs
    val orderLoc = order
    val childOut = child.output
    val rankLoc = if (partial) None else rankAttr
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLoc, childOut)
      val ord = GenerateOrdering.generate(orderLoc, childOut)
      val rankProj = rankLoc.map(a => UnsafeProjection.create(childOut :+ a, childOut :+ a))
      val joined = new JoinedRow
      val rankCell = new GenericInternalRow(1)
      // head of each heap = currently-worst retained row (max under ord)
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      new Iterator[InternalRow] {
        private val heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var retained = 0
        private var out: Iterator[InternalRow] = Iterator.empty

        private def consume(row: InternalRow): Unit = {
          val key = keyProj(row) // reused buffer; copied only on first sight
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLoc, heapCmp)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLoc) { heap.add(row.copy()); retained += 1 }
          else if (ord.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
        }

        private def drain(): Iterator[InternalRow] = {
          val groups = heaps.values().iterator()
          val all = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          while (groups.hasNext) {
            val h = groups.next()
            val rows = new Array[InternalRow](h.size)
            var i = rows.length - 1
            while (i >= 0) { rows(i) = h.poll(); i -= 1 } // reverse-drain = ascending
            rankProj match {
              case Some(p) =>
                i = 0
                while (i < rows.length) {
                  rankCell.setInt(0, i + 1)
                  all += p(joined(rows(i), rankCell)).copy()
                  i += 1
                }
              case None => all ++= rows
            }
          }
          heaps.clear(); retained = 0
          all.iterator
        }

        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) {
            while (iter.hasNext && retained < flushLoc) consume(iter.next())
            if (!heaps.isEmpty) out = drain()
          }
          out.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty partition")
          numOutputRows += 1
          out.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

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
  *
  * `ties = true` is the `rank() <= k` contract instead: every row whose
  * rank (1 + count of strictly-better rows) is ≤ k survives — boundary
  * ties are KEPT, so a group can emit more than k rows, exactly like
  * the window spelling. The survivor set is then {x : x ≤ r_k} for r_k
  * the k-th best row with multiplicity, which the exec maintains as an
  * ordered tie-class structure (see `GroupedTopKExec`); `rankAttr`
  * carries `rank()` (equal rows share a rank, gaps after ties).
  */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None,
    ties: Boolean = false) extends UnaryNode {
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
    case GroupedTopKNode(g, o, k, child, rank, ties) =>
      val partial = GroupedTopKExec(g, o, k, partial = true, planLater(child),
        ties = ties)
      GroupedTopKExec(g, o, k, partial = false, partial, rank, ties) :: Nil
    case _ => Nil
  }
}

/** Heap-per-group physical top-k. `partial = true` is the map-side
  * combine (any distribution, flush-on-pressure); `partial = false`
  * requires clustering on `groupExprs` and is exact. When `rankAttr`
  * is set (final only), each group's rows additionally carry their
  * 1-based in-group rank under `order` — the `row_number` (or, with
  * `ties = true`, the `rank()`) the [[InferGroupedTopK]] rewrite
  * replaces.
  *
  * `ties = true` keeps boundary ties (`rank() <= k` semantics): instead
  * of a k-bounded heap, each group holds a TreeMap of tie-classes
  * (rows with pairwise-equal order keys) and evicts the worst class
  * only once the strictly-better retained rows already number ≥ k —
  * at which point every row of that class provably has rank > k
  * (strictly-less counts only grow). Retained state is k plus the
  * boundary tie-class, the same worst case the window plan buffers.
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None,
    ties: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "partialFlushes" -> SQLMetrics.createMetric(sparkContext, "partial heap flushes"))

  /** Partial-pass memory ceiling, rows AND bytes (row count alone lets
    * wide document rows pin gigabytes before the row ceiling fires —
    * the WindowExec plan this operator replaces would have spilled).
    * Exceeding either emits the current heaps and resets (correct under
    * final re-selection). Both are conf-tunable so auto-rewritten
    * wide-row queries can be degraded deliberately rather than OOM.
    */
  private val flushRows: Int =
    if (partial)
      conf.getConfString("spark.graft.topk.partial.flushRows",
        (4 * 1024 * 1024).toString).toInt
    else Int.MaxValue
  private val flushBytes: Long =
    if (partial)
      conf.getConfString("spark.graft.topk.partial.flushBytes",
        (64L * 1024 * 1024).toString).toLong
    else Long.MaxValue

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numFlushes = longMetric("partialFlushes")
    val kLoc = k
    val flushLoc = flushRows
    val flushBytesLoc = flushBytes
    val partialLoc = partial
    val groupLoc = groupExprs
    val orderLoc = order
    val childOut = child.output
    val rankLoc = if (partial) None else rankAttr
    val tiesLoc = ties
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
      if (tiesLoc) new Iterator[InternalRow] {
        // rank()-semantics state: per group, an ordered map of
        // tie-classes (key = first retained row of the class, value =
        // all rows of the class) + the group's retained-row total
        final class GroupState {
          val buckets = new java.util.TreeMap[InternalRow,
            scala.collection.mutable.ArrayBuffer[InternalRow]](ord)
          var total = 0
        }
        private val groups = new java.util.HashMap[UnsafeRow, GroupState]()
        private var retained = 0
        private var retainedBytes = 0L
        private var out: Iterator[InternalRow] = Iterator.empty

        private def sizeOf(row: InternalRow): Long = row match {
          case u: UnsafeRow => u.getSizeInBytes.toLong + 16L
          case r => 64L + 16L * r.numFields
        }

        private def consume(row: InternalRow): Unit = {
          val key = keyProj(row)
          var st = groups.get(key)
          if (st == null) {
            st = new GroupState
            val keyCopy = key.copy()
            groups.put(keyCopy, st)
            retainedBytes += sizeOf(keyCopy)
          }
          val c = row.copy()
          var bucket = st.buckets.get(c)
          if (bucket == null) {
            bucket = new scala.collection.mutable.ArrayBuffer[InternalRow](1)
            st.buckets.put(c, bucket)
          }
          bucket += c
          st.total += 1; retained += 1; retainedBytes += sizeOf(c)
          // evict the worst tie-class once ≥ k strictly-better rows are
          // retained — its rows provably have rank > k
          var last = st.buckets.lastEntry()
          while (last != null && st.total - last.getValue.size >= kLoc) {
            st.buckets.remove(last.getKey)
            st.total -= last.getValue.size
            retained -= last.getValue.size
            last.getValue.foreach(r => retainedBytes -= sizeOf(r))
            last = st.buckets.lastEntry()
          }
        }

        private def drain(): Iterator[InternalRow] = {
          val all = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          val git = groups.values().iterator()
          while (git.hasNext) {
            val st = git.next()
            val bit = st.buckets.values().iterator()
            var before = 0
            while (bit.hasNext) {
              val bucket = bit.next()
              rankProj match {
                case Some(p) =>
                  rankCell.setInt(0, before + 1) // rank(): ties share, then gap
                  bucket.foreach(r => all += p(joined(r, rankCell)).copy())
                case None => all ++= bucket
              }
              before += bucket.size
            }
          }
          groups.clear(); retained = 0; retainedBytes = 0L
          all.iterator
        }

        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) {
            while (iter.hasNext && retained < flushLoc &&
              retainedBytes < flushBytesLoc) consume(iter.next())
            if (!groups.isEmpty) {
              if (iter.hasNext && partialLoc) numFlushes += 1
              out = drain()
            }
          }
          out.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty partition")
          numOutputRows += 1
          out.next()
        }
      }
      else new Iterator[InternalRow] {
        private val heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var retained = 0
        private var retainedBytes = 0L
        private var out: Iterator[InternalRow] = Iterator.empty

        // retained copies are UnsafeRow in practice (child rows are
        // unsafe); the fallback keeps the accounting sane if not
        private def sizeOf(row: InternalRow): Long = row match {
          case u: UnsafeRow => u.getSizeInBytes.toLong + 16L
          case r => 64L + 16L * r.numFields
        }

        private def consume(row: InternalRow): Unit = {
          val key = keyProj(row) // reused buffer; copied only on first sight
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLoc, heapCmp)
            val keyCopy = key.copy()
            heaps.put(keyCopy, heap)
            retainedBytes += sizeOf(keyCopy)
          }
          if (heap.size < kLoc) {
            val c = row.copy()
            heap.add(c); retained += 1; retainedBytes += sizeOf(c)
          } else if (ord.compare(row, heap.peek()) < 0) {
            retainedBytes -= sizeOf(heap.poll())
            val c = row.copy()
            heap.add(c); retainedBytes += sizeOf(c)
          }
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
          heaps.clear(); retained = 0; retainedBytes = 0L
          all.iterator
        }

        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) {
            while (iter.hasNext && retained < flushLoc &&
              retainedBytes < flushBytesLoc) consume(iter.next())
            if (!heaps.isEmpty) {
              if (iter.hasNext && partialLoc) numFlushes += 1
              out = drain()
            }
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

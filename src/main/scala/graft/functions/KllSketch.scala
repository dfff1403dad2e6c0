package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregate — the MERGEABLE quantile state the
  * dataset cards were missing: counters and HLL cards merge across
  * shards/days ([[graft.operators.CorpusStats.mergeCards]]), but "p99
  * document length per source" previously needed either a re-scan
  * (exact percentile) or approx_percentile's non-mergeable output.
  * A KLL sketch is O(k·log(n/k)) state, merges by sketch union with no
  * re-scan, and answers any quantile after the fact.
  *
  * Determinism contract: BELOW the first compaction (n ≤ level-0
  * capacity, ~k items per sketch) a KLL sketch retains every value and
  * INCLUSIVE quantiles are EXACT order statistics — the smallest item
  * whose inclusive rank ≥ ⌈q·n⌉ — which an external engine replays as
  * a plain ordered index. Above capacity, compaction flips DataSketches'
  * shared random bit and estimates become run-varying; the rank error
  * bounds still hold (~1.65% at k=200) but gates must pin group sizes
  * under k (the [[FreqSketchAgg]] purge-mode pattern).
  */
object KllSketch {

  def kllAgg(c: Column, k: Int = 1024): Column =
    GraftBridge.column(
      KllSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  def kllQuantile(sketch: Column, q: Column): Column =
    GraftBridge.column(KllQuantile(
      GraftBridge.expression(sketch), GraftBridge.expression(q)))

  def wrap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  def merge(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "need at least one sketch")
    val m = wrap(sketches.head)
    sketches.tail.foreach(b => m.merge(wrap(b)))
    m.toByteArray
  }
}

/** TypedImperativeAggregate producing KLL sketch bytes over a numeric
  * column; map-side partial aggregation applies, the shuffle carries
  * sketch bytes.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch requires a numeric column, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null      => ()
      case d: Double => buffer.update(d)
      case f: Float  => buffer.update(f.toDouble)
      case l: Long   => buffer.update(l.toDouble)
      case i: Int    => buffer.update(i.toDouble)
      case other => throw new IllegalArgumentException(
        s"kll_sketch: unsupported value $other")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.wrap(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** INCLUSIVE quantile of a KLL sketch column: exact order statistic in
  * exact mode, rank-bounded estimate after compaction. Runs once per
  * GROUP row — CodegenFallback is off the hot path (the
  * [[ThetaEstimate]] rationale).
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    // a bare SQL literal like 0.5 parses as DECIMAL(1,1) under ANSI —
    // accept any numeric rank
    case (BinaryType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (binary, numeric), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sk: Any, q: Any): Any = {
    val s = KllSketch.wrap(sk.asInstanceOf[Array[Byte]])
    val rank = q match {
      case d: Double  => d
      case f: Float   => f.toDouble
      case l: Long    => l.toDouble
      case i: Int     => i.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_quantile: unsupported rank $other")
    }
    if (s.isEmpty) null
    else s.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

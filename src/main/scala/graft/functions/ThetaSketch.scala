package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch set algebra over distinct-value sets — the piece HLL
  * (`hll_sketch_agg`, used by [[graft.operators.CorpusStats
  * .datasetCardSketch]]) cannot do: INTERSECTION and DIFFERENCE
  * cardinalities. A theta sketch is a uniform hash-sample of the
  * distinct values below an adaptive threshold θ, so per-group sketches
  * support `A ∩ B` / `A \ B` / `A ∪ B` estimates without re-scanning
  * either input — cross-split contamination overlap, day-over-day new
  * -content volume, split-leakage matrices at 100 TB come from k tiny
  * per-group sketches instead of k² distinct-count joins.
  *
  * Built on the DataSketches theta library (on Spark's own classpath;
  * Spark exposes only its HLL wrappers in SQL). Aggregation buffer is a
  * theta Union gadget; the materialized column is the standard compact
  * sketch byte layout, so sketches persist to parquet and merge across
  * jobs/days — the same mergeability contract as the HLL dataset card.
  *
  * Precision: below ~2^lgK distinct values a theta sketch is in EXACT
  * mode (θ = 1, every hash retained) and the estimates are exact
  * integers — which is what makes the oracle gate hash-comparable at
  * test scale; above it the relative standard error is ~1/√(2^lgK)
  * (~0.8% at the default lgK 14). Set-op results on exact-mode inputs
  * are exact.
  *
  * The scalar ops are CodegenFallback: they run once per GROUP (k rows,
  * not corpus rows), so interpreted eval is not a hot path, and the
  * sketch wire format is the cross-engine contract worth keeping.
  */
object ThetaSketch {

  private[functions] def updateWith(u: Union, v: Any): Unit = v match {
    case null               => ()
    case s: UTF8String      => u.update(s.toString)
    case b: Array[Byte]     => u.update(b)
    case l: Long            => u.update(l)
    case i: Int             => u.update(i.toLong)
    case other => throw new IllegalArgumentException(
      s"theta_sketch_agg: unsupported value $other")
  }

  private[functions] def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  /** Aggregate a column of strings/longs/binary into a compact theta
    * sketch (binary).
    */
  def thetaAgg(c: Column, lgK: Int = 14): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(c), lgK).toAggregateExpression())

  /** Distinct-count estimate of one sketch. */
  def estimate(sketch: Column): Column =
    GraftBridge.column(ThetaEstimate(GraftBridge.expression(sketch)))

  /** |A ∩ B| estimate from two compact sketches. */
  def intersectEstimate(a: Column, b: Column): Column =
    GraftBridge.column(ThetaSetEstimate(
      GraftBridge.expression(a), GraftBridge.expression(b), ThetaSetEstimate.Intersect))

  /** |A \ B| estimate from two compact sketches. */
  def aNotBEstimate(a: Column, b: Column): Column =
    GraftBridge.column(ThetaSetEstimate(
      GraftBridge.expression(a), GraftBridge.expression(b), ThetaSetEstimate.ANotB))

  /** |A ∪ B| estimate from two compact sketches. */
  def unionEstimate(a: Column, b: Column): Column =
    GraftBridge.column(ThetaSetEstimate(
      GraftBridge.expression(a), GraftBridge.expression(b), ThetaSetEstimate.UnionOp))
}

/** TypedImperativeAggregate producing a compact theta sketch of the
  * child column's distinct values. Partial aggregation applies: each
  * map task keeps one Union gadget, the shuffle carries compact sketch
  * bytes (≤ 16·2^lgK bytes per group), never values.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires string/binary/long/int, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    ThetaSketch.updateWith(buffer, child.eval(input))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Estimate of a compact theta sketch's distinct count. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires a binary sketch, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def nullSafeEval(input: Any): Any =
    ThetaSketch.wrap(input.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaSetEstimate {
  sealed trait Op { def name: String }
  case object Intersect extends Op { val name = "theta_intersect_estimate" }
  case object ANotB extends Op { val name = "theta_anotb_estimate" }
  case object UnionOp extends Op { val name = "theta_union_estimate" }
}

/** Set-operation estimate over two compact theta sketch columns. */
case class ThetaSetEstimate(left: Expression, right: Expression,
                            op: ThetaSetEstimate.Op)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${op.name} requires two binary sketches, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = op.name

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa: Sketch = ThetaSketch.wrap(a.asInstanceOf[Array[Byte]])
    val sb: Sketch = ThetaSketch.wrap(b.asInstanceOf[Array[Byte]])
    op match {
      case ThetaSetEstimate.Intersect =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb)
        i.getResult.getEstimate
      case ThetaSetEstimate.ANotB =>
        SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
      case ThetaSetEstimate.UnionOp =>
        val u = SetOperation.builder().buildUnion()
        u.union(sa); u.union(sb)
        u.getResult.getEstimate
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (Misra–Gries / SpaceSaving family) sketch aggregate —
  * the DETERMINISTIC-BOUND twin of the CMS heavy-hitter path
  * (`Salience.tokenSketch`): where CMS gives a probabilistic
  * overestimate bound at a confidence, the frequencies ItemsSketch
  * guarantees, unconditionally, true ∈ [lowerBound, upperBound] with
  * upper − lower ≤ ~3.5·N/maxMapSize, and NO_FALSE_NEGATIVES retrieval
  * returns a superset of every item above the error line. Sketch state
  * is O(maxMapSize) regardless of vocabulary size, partial aggregation
  * applies (map tasks fold locally, the shuffle carries sketch bytes),
  * and same-family sketches MERGE without re-scanning — per-shard /
  * per-day token sketches fold into corpus totals like the HLL cards
  * and theta sketches. Beyond-reference surface (SURVEY §2.13).
  *
  * Estimates are engine-specific (they depend on purge history), so
  * gates self-assert the bounds against exact censuses rather than
  * hash-comparing values — the [[ThetaSketchAgg]] precedent: below
  * maxMapSize active items no purge ever happens and every estimate is
  * EXACT, which is what makes the merge-equality assertion possible at
  * test scale.
  */
object FreqSketch {

  private[graft] val serde = new ArrayOfStringsSerDe

  /** Aggregate a string column into frequencies-sketch bytes. */
  def freqAgg(c: Column, maxMapSize: Int = 1024): Column =
    GraftBridge.column(
      FreqSketchAgg(GraftBridge.expression(c), maxMapSize)
        .toAggregateExpression())

  def wrap(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)
}

/** TypedImperativeAggregate producing frequencies-sketch bytes over the
  * child string column. maxMapSize must be a power of two; the error
  * envelope is ≤ 3.5·N/maxMapSize (Metwally/Misra–Gries analysis as
  * implemented by DataSketches).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a string column, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    child.eval(input) match {
      case null          => ()
      case s: UTF8String => buffer.update(s.toString)
      case other => throw new IllegalArgumentException(
        s"freq_sketch: unsupported value $other")
    }
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.wrap(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

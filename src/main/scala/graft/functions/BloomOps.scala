package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a driver-built Bloom filter — the
  * pre-filter tier for incremental dedup against a corpus-sized
  * fingerprint index: rows the filter rejects are DEFINITELY novel and
  * skip the anti-join shuffle entirely; only might-contain rows (true
  * hits + the fpp false positives) pay the join. No correctness trade —
  * the filter only routes, the join still decides.
  *
  * The filter ships once per executor via the codegen reference-object
  * channel (no per-row deserialization); probes are putBinary-symmetric
  * with [[BloomOps.buildFilter]]'s inserts, so the pair can never
  * half-change hash schemes. Codegen'd — one array hash + bit probes
  * per row inside the stage, no UDF.
  */
case class BloomMightContain(child: Expression,
                             filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $ref.mightContainBinary($in.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomOps {

  /** Distributed Bloom-filter build over a string column: treeAggregate
    * of per-partition filters (putBinary over the column's UTF-8 bytes,
    * mergeInPlace up the tree — Bloom filters OR together losslessly).
    * Driver holds ONE filter of ~1.2 MB per million expected items at
    * fpp 0.01 — fine through ~10⁹ fingerprints; past that, skip the
    * bloom tier and rely on the partitioned anti-join (the filter no
    * longer broadcasts, which is the tier boundary, not a correctness
    * limit).
    */
  def buildFilter(df: org.apache.spark.sql.DataFrame, column: String,
                  expectedItems: Long, fpp: Double = 0.01): BloomFilter = {
    require(expectedItems >= 1, s"expectedItems must be >= 1, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    df.select(column).where(org.apache.spark.sql.functions.col(column).isNotNull)
      .queryExecution.toRdd
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, row) => { f.putBinary(row.getUTF8String(0).getBytes); f },
        (a, b) => { a.mergeInPlace(b); a })
  }

  def mightContain(value: Column, filter: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    GraftBridge.column(
      BloomMightContain(GraftBridge.expression(value), out.toByteArray))
  }

  /** Per-GROUP Bloom filter aggregate over a string column (binary
    * result, standard Spark sketch wire format) — the builder for
    * file/partition-grain skipping indexes ([[graft.operators
    * .BloomIndex]]): one distributed pass, partial aggregation carries
    * filter bytes (~1.2 MB per million expected items at fpp 0.01), and
    * filters OR together losslessly so per-file rows merge up to any
    * coarser grain without re-scanning data.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    require(expectedItems >= 1, s"expectedItems must be >= 1, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())
  }

  /** Probe a Bloom filter stored as a BYTES COLUMN (one filter per row
    * — the skipping-index shape, where the filter varies per row and
    * the probed value is fixed per query). Deserializes the filter per
    * evaluation: acceptable by contract because the input is an INDEX
    * table (one row per file), never a data table — documented on
    * [[graft.operators.BloomIndex]].
    */
  def bytesMightContain(filterBytes: Column, value: Column): Column =
    GraftBridge.column(BloomBytesMightContain(
      GraftBridge.expression(filterBytes), GraftBridge.expression(value)))
}

/** TypedImperativeAggregate building a Bloom filter of the child string
  * column per group. Same putBinary hashing as [[BloomOps.buildFilter]]
  * and [[BloomMightContain]] — the build/probe pair can never
  * half-change hash schemes.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a string argument, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  private def toBytes(f: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }

  override def eval(buffer: BloomFilter): Any = toBytes(buffer)
  override def serialize(buffer: BloomFilter): Array[Byte] = toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Row-wise probe: left = filter bytes (binary), right = value (string).
  * CodegenFallback by design — it evaluates once per INDEX row (file
  * grain), so interpreted eval with a per-row readFrom is not a hot
  * path, and fallback keeps the filter deserialization out of codegen.
  */
case class BloomBytesMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_bytes_might_contain requires (binary, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bytes: Any, value: Any): Any =
    BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
      .mightContainBinary(value.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBytesMightContain =
    copy(left = newLeft, right = newRight)
}

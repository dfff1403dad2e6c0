package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
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
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a Gear rolling hash (the
  * FastCDC/rsync family): the hash h ← (2h + g(c)) mod 2³² carries an
  * implicit ~32-codepoint window (each shift ages a codepoint out), and
  * a boundary cuts where the hash lands on a zero residue — so the SAME
  * CONTENT cuts at the same places regardless of where it sits in the
  * document. That offset-independence is the whole point: insert one
  * sentence at the top of a near-copy and fixed-width shingles all
  * shift (every window changes), but CDC chunks re-align one chunk
  * later — chunk-grain dedup/delta storage survives edits that defeat
  * fixed-grid chunking.
  *
  * Contract (mirrored bit-for-bit by the SQL oracle): codepoint walk
  * (Spark and DuckDB substr/ord are both codepoint-grain); gear
  * g(c) = (c · 2654435761) mod 2³² (Knuth multiplicative — replayable
  * in integer SQL, unlike a random byte table); boundary at position p
  * (1-based) iff p − last ≥ minLen AND (h ≡ 0 mod 2^maskBits OR
  * p − last ≥ maxLen); the final partial chunk always closes at the
  * end. Output = array of chunk END positions (exclusive, codepoint
  * units); empty input → empty array.
  *
  * ONE native expression call per document keeps the scan inside
  * whole-stage codegen (the generated code calls the static
  * [[GearChunks.compute]] kernel, the [[LcsLength]] shape): the 100 TB
  * cost is exactly one pass over the bytes already being read, no
  * per-char rows, no shuffle — chunking is a projection.
  */
case class GearChunks(child: Expression, minLen: Int, maskBits: Int,
                      maxLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if minLen >= 1 && maxLen >= minLen &&
      maskBits >= 1 && maskBits <= 31 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"gear_chunks needs 1 <= minLen <= maxLen and maskBits in 1..31, " +
        s"got minLen=$minLen maskBits=$maskBits maxLen=$maxLen")
    case t => TypeCheckResult.TypeCheckFailure(
      s"gear_chunks requires a string argument, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    GearChunks.compute(s.asInstanceOf[UTF8String], minLen, maskBits, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GearChunks.compute(" +
        s"$s, $minLen, $maskBits, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {

  private val M32 = 0xFFFFFFFFL

  /** One codepoint walk; static so generated code calls it directly. */
  def compute(s: UTF8String, minLen: Int, maskBits: Int,
              maxLen: Int): GenericArrayData = {
    val str = s.toString
    val mask = (1L << maskBits) - 1L
    var ends = List.empty[Long]
    var h = 0L
    var last = 0L
    var p = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      p += 1L
      h = ((h << 1) + (cp.toLong * 2654435761L & M32)) & M32
      if (p - last >= minLen && ((h & mask) == 0L || p - last >= maxLen)) {
        ends = p :: ends
        last = p
      }
    }
    if (last < p) ends = p :: ends
    new GenericArrayData(ends.reverse.toArray)
  }

  def gearChunks(text: Column, minLen: Int, maskBits: Int,
                 maxLen: Int): Column =
    GraftBridge.column(GearChunks(
      GraftBridge.expression(text), minLen, maskBits, maxLen))
}

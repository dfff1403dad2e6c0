package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit Karp–Rabin rolling hash of a string's UTF-8 bytes:
  * h = Σ b_i · base^(n−1−i) (mod 2^64), the classic polynomial rolling
  * construction. One codegen multiply-add per byte — cheaper than md5
  * (no block cipher rounds) and incrementally updatable (a streaming
  * window can roll bytes in/out in O(1)), which is why training-data
  * pipelines fingerprint shards with it.
  *
  * Content-identity semantics match [[graft.operators.TextAnalysis
  * .fingerprint]] when applied to the same normalized text. The digest
  * is plain integer arithmetic, so it IS oracle-portable: the
  * `t_rolling_fp` gate replays the byte fold as a recursive CTE in
  * HUGEINT mod 2^64 (the d_cdc_chunks per-codepoint-recurrence pattern,
  * with each codepoint expanded to its UTF-8 bytes arithmetically).
  */
case class RollingHash64(child: Expression, base: Long)
    extends UnaryExpression {

  // analysis-time rejection of wrong-typed arguments (e.g. rolling_hash on
  // a numeric column through the SQL surface) instead of a runtime
  // ClassCastException from inside generated code
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $in.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${base}L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  /** Standard polynomial base (odd, large — good bit diffusion mod 2^64). */
  val DefaultBase: Long = 1099511628211L // FNV-1a prime

  def rollingHash(text: Column, base: Long = DefaultBase): Column =
    GraftBridge.column(RollingHash64(GraftBridge.expression(text), base))
}

/** ALL character n-gram rolling hashes of a string in ONE pass — the
  * production gram-key path for character-n-gram metrics (chrF): where
  * the naive plan materializes every n-gram SUBSTRING and digests each
  * (≈ n_chars allocations + hashes per order per side — the measured
  * structural cost of the x_chrf gate), this emits the polynomial hash
  * of every window by the O(1) Karp–Rabin roll
  * h' = (h − c_out·base^(n−1))·base + c_in over a codepoint array built
  * once per row. No gram strings exist at any point.
  *
  * Gram boundaries are CODEPOINTS (matching `substr`'s character
  * semantics), so gram identity — and therefore every clipped count —
  * is exactly the portable md5-substring path's, modulo 64-bit
  * collisions. Engine-specific digest → rows-only gates; the md5 twin
  * stays the oracle.
  */
case class NGramRollingHashes(child: Expression, n: Int, base: Long)
    extends UnaryExpression {

  require(n > 0, "n-gram size must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_rolling_hashes requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NGramHashKernel.compute(input.asInstanceOf[UTF8String], n, base)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.NGramHashKernel.compute($in, $n, ${base}L);")

  override protected def withNewChildInternal(newChild: Expression): NGramRollingHashes =
    copy(child = newChild)
}

/** Row kernel for [[NGramRollingHashes]] — plain object ⇒ static
  * forwarder reachable from generated Java (the ShingleKernel pattern).
  */
object NGramHashKernel {
  def compute(input: UTF8String, n: Int,
              base: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = input.toString
    val cps = new Array[Int](s.length)
    var cn = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(cn) = cp; cn += 1
      i += Character.charCount(cp)
    }
    val m = cn - n + 1
    if (m <= 0)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var pow = 1L
    var j = 0
    while (j < n - 1) { pow *= base; j += 1 }
    var h = 0L
    j = 0
    while (j < n) { h = h * base + cps(j); j += 1 }
    out(0) = h
    j = 1
    while (j < m) {
      h = (h - cps(j - 1) * pow) * base + cps(j + n - 1)
      out(j) = h
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

object NGramRollingHashes {
  def ngramHashes(text: Column, n: Int,
                  base: Long = RollingHash64.DefaultBase): Column =
    GraftBridge.column(NGramRollingHashes(GraftBridge.expression(text), n, base))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization (beyond-reference surface, SURVEY §2.13).
  *
  * Symmetric per-vector int8 quantization: q_i = round(v_i · 127 / maxabs)
  * with maxabs = max |v_i|. Cuts embedding storage 4× (float32 → int8) and
  * shuffle bytes with it — at 100 TB the ANN/semantic-dedup working set is
  * dominated by the vectors themselves, so quantizing before the bucketed
  * joins shrinks every exchange and cache 4×.
  *
  * Cosine is scale-invariant, so quantized cosine needs NO dequantize:
  * cos(q_a, q_b) approximates cos(v_a, v_b) directly (the per-vector scale
  * cancels). [[quantizedTopK]] exploits that — the int arrays feed the same
  * fused codegen cosine as the float path ([[graft.functions.VectorOps]]
  * accepts int/tinyint element types).
  *
  * Everything is built from codegen'd column expressions (transform /
  * aggregate higher-order functions + native cosine) — no UDFs.
  */
object Quantize {

  /** max |v_i| of an array<float/double> column, as double. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Quantized vector from a PRE-MATERIALIZED maxabs column: array<int> in
    * [-127, 127]; all-zero vectors quantize to all-zero (maxabs = 0
    * guard). round() is HALF_UP on both Spark and the DuckDB oracle, and
    * inputs are floats with no exact .5 products, so the rounded grid is
    * engine-portable.
    *
    * `ma` must be a plain attribute, not the maxAbs expression itself: an
    * expression argument gets inlined into the per-element lambda and
    * re-evaluated for EVERY element (O(dim²) traversals + a transform
    * allocation per element — measured 10× on dim 64).
    */
  def int8Column(vec: Column, ma: Column): Column =
    transform(vec, x =>
      when(ma === 0d, lit(0))
        .otherwise(round(x.cast("double") * lit(127.0d) / ma).cast("int")))

  /** (id, scale, qvec): scale = maxabs / 127 reconstructs v_i ≈ q_i·scale.
    * scale is rounded to 9 dp for oracle hash stability (float32 inputs
    * carry < 7 significant digits, so nothing real is lost). maxabs is
    * materialized once per row in its own projection — CollapseProject
    * keeps it (non-cheap, multiply-referenced), so the lambda sees an
    * attribute, not the array traversal.
    */
  def int8(corpus: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(idCol), col(vecCol), maxAbs(col(vecCol)).as("_ma"))
      .select(
        col(idCol),
        round(col("_ma") / 127.0d, 9).as("scale"),
        int8Column(col(vecCol), col("_ma")).as("qvec"))

  /** Exact top-k over the QUANTIZED vectors: same output contract as
    * [[Similarity.bruteForceTopK]] (rank by cosine desc, 6 dp), but every
    * comparison runs on int8 arrays — the memory/shuffle-bound scale path.
    * Recall vs the float path is gated in the test suite.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val c = int8(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").as("_cv"))
    val q = int8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("_qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        graft.functions.VectorOps.cosine(col("_cv"), col("_qv")))
    Similarity.topK(scored, k) // the one shared ranking contract
  }
}

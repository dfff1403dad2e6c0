package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (1-bit) embedding quantization + Hamming search with asymmetric
  * float rerank (beyond-reference surface, SURVEY §2.13).
  *
  * The most aggressive point on the vector-compression curve next to
  * [[Quantize]] (int8, 4×) and [[ProductQuantizer]] (PQ, ~32×): one SIGN
  * BIT per coordinate — 32× smaller than float32, a dim-64 vector becomes
  * ONE long. Hamming distance on the packed words (xor + popcount, both
  * codegen'd integer ops) is a monotone proxy for angular distance
  * (Goemans–Williamson: P[sign mismatch] = θ/π per coordinate), so the
  * standard two-stage retrieval applies — Hamming top-R candidates over
  * the packed corpus, then exact float cosine rerank of the R survivors
  * ("binary passage retrieval"). At 100 TB the first stage scans longs
  * instead of float arrays: 32× less memory bandwidth and shuffle, and
  * the rerank touches only R·|queries| float vectors.
  *
  * Everything is built from codegen'd column expressions (transform /
  * aggregate / zip_with + bit_count) — no UDFs; the packing replays
  * per-coordinate in an external SQL oracle (the oracle compares signs
  * directly instead of re-deriving two's-complement words, same result by
  * construction).
  */
object BinaryQuantize {

  /** One packed 64-bit word covering coordinates [lo, hi): bit (i − lo)
    * set iff v_i > 0 (zeros and negatives clear — the tie rule the oracle
    * replays). Bit 63 lands via bitwise OR of shiftleft(1L, 63) =
    * Long.MinValue — OR, not +, so no ANSI overflow edge.
    */
  private def word(vec: Column, lo: Int, hi: Int): Column =
    aggregate(sequence(lit(lo), lit(hi - 1)), lit(0L),
      (acc, i) =>
        when(element_at(vec, (i + 1).cast("int")).cast("double") > 0d,
          acc.bitwiseOR(call_function("shiftleft", lit(1L), i - lit(lo))))
          .otherwise(acc))

  /** Sign-packed signature: array of ⌈dim/64⌉ longs, word w covering
    * coordinates [64w, 64w+64). dim = 64 → a single long per vector.
    */
  def signPack(vec: Column, dim: Int): Column = {
    require(dim > 0, "dim must be positive")
    val words = (dim + 63) / 64
    array((0 until words).map { w =>
      word(vec, w * 64, math.min(dim, w * 64 + 64))
    }: _*)
  }

  /** Hamming distance between two packed signatures (same word count):
    * Σ popcount(a_w xor b_w). Pure integer codegen.
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, h) => acc + h)

  /** (id, sig) packed-signature frame. */
  def pack(corpus: DataFrame, dim: Int, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), signPack(col(vecCol), dim).as("sig"))

  /** Hamming top-k of each query against the packed corpus:
    * (query_id, neighbor_id, hamming, rank), rank by (hamming asc,
    * neighbor_id asc) — Hamming ties are dense (small integer range), so
    * the id tie-break is what makes the output deterministic and
    * oracle-replayable. Queries broadcast (bounded set); the corpus side
    * streams packed longs only.
    */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val c = pack(corpus, dim, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("sig").as("_cs"))
    val q = pack(queries, dim, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("sig").as("_qs"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming", hamming(col("_cs"), col("_qs")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "hamming", "rank")
  }

  /** Two-stage retrieval: Hamming top-`rerank` candidates, then exact
    * float-cosine rerank to top-k — the 100 TB shape (stage 1 never
    * touches a float array). Output contract matches
    * [[Similarity.bruteForceTopK]]: (query_id, neighbor_id, cosine, rank)
    * with 6 dp rounding and id tie-break.
    */
  def rerankTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                 rerank: Int = 50, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must be >= k $k")
    val cand = binaryTopK(corpus, queries, rerank, dim, idCol, vecCol)
      .select("query_id", "neighbor_id")
    val scored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("_cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"))), Seq("query_id"))
      .withColumn("cosine",
        graft.functions.VectorOps.cosine(col("_cv"), col("_qv")))
    Similarity.topK(scored, k)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over an embedding column (array<float>).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast of the query
  *    set + a native fused cosine expression (one codegen loop per pair,
  *    no UDF, no per-row cast). The corpus is scanned once; correct
  *    baseline at any scale, O(corpus × queries) work.
  *  - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH. Signature bits
  *    from sign(v·r_i) with seeded deterministic hyperplanes; bucketed
  *    self-join gives the scale path — each probe only scores its bucket.
  *    Recall is tunable by `planes` (fewer planes → bigger buckets →
  *    higher recall, more work).
  */
object Similarity {

  /** Shared output contract for every top-k variant: rank by the
    * 6dp-ROUNDED cosine desc (neighbor_id tiebreak), keep rank ≤ k.
    * Ranking on the rounded score — not the raw double — is load-bearing
    * for engine portability: dot/(√·√) is not guaranteed ulp-identical
    * across engines (operation order differs), so near-ties could rank
    * differently if the raw value ordered the window; at 6dp both engines
    * agree and the id tiebreak is total. Package-visible so every variant
    * ([[Quantize.quantizedTopK]] included) ranks under the ONE contract —
    * recall gates compare their outputs directly.
    */
  private[operators] def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos6").desc, col("neighbor_id").asc)
    scored
      .withColumn("_cos6", round(col("cosine"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("_cos6").as("cosine"), col("rank"))
  }

  /** v·w for two array<float/double> columns — native fused expression
    * (graft.functions.VectorOps): one codegen loop per row, mixed element
    * types allowed (no per-row cast-copy of the vector).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.VectorOps.cosine(a, b)

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (id, vec) rows — id column `idCol`, embedding `vecCol`
    * @param queries (query_id, vec) rows; broadcast (must be small)
    * @return (query_id, neighbor_id, cosine, rank) with rank ≤ k,
    *         self-matches excluded, rounded to 6dp for oracle stability
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("_cv"), col("_qv")))
    topK(scored, k)
  }

  /** Deterministic random hyperplanes: `planes` × `dim` doubles. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Signature = bit b set iff v · r_b > 0; one long per row. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 64,
      s"at most 64 hyperplanes fit one long signature, got ${planes.length}")
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Attach an LSH bucket id to every row. */
  def lshBuckets(corpus: DataFrame, dim: Int, planes: Int = 12,
                 seed: Long = 42L, vecCol: String = "embedding"): DataFrame = {
    val hp = hyperplanes(dim, planes, seed)
    corpus.withColumn("bucket", signature(col(vecCol), hp))
  }

  /** IVF (inverted-file) ANN: a seeded sample of corpus vectors acts as
    * the coarse quantizer; every vector is assigned to its nearest
    * centroid (one list membership), queries probe their `nProbe` nearest
    * centroid lists and score only those. At scale the corpus is
    * partitioned by centroid id — each probe touches nLists/nProbe of the
    * data; centroids are a broadcast literal.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // coarse quantizer: bounded, limit-terminated head fetch — a LIMIT
    // with no sample/sort reads only as many partitions as needed (at any
    // corpus size), then a seeded driver-side shuffle of the ≤16·nLists-row
    // pool decorrelates centroids from file order. Never plans a
    // corpus-fraction sample scan (the previous sample(0.5) did, bounded
    // only by limit pushdown).
    val pool: Array[Array[Double]] = corpus
      .select(col(vecCol)).limit(math.max(nLists * 16, 256)).collect()
      .map(_.getSeq[AnyRef](0).map(_.asInstanceOf[Number].doubleValue()).toArray)
    val quantizer: Array[Array[Double]] =
      new Random(seed).shuffle(pool.toSeq).take(nLists).toArray
    ivfTopKWith(corpus, queries, quantizer, k, nProbe, idCol, vecCol)
  }

  /** IVF ANN against CALLER-PROVIDED centroids (list id = array index) —
    * the deterministic core the auto-quantizer overload wraps. Callers can
    * pass [[Clustering.kmeans]] output for a trained quantizer, or fixed
    * vectors for an engine-portable, oracle-replayable plan.
    */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame,
                  quantizer: Array[Array[Double]], k: Int, nProbe: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(quantizer.nonEmpty, "corpus too small for the requested nLists")

    // ‖v−c‖² = ‖v‖² − 2 v·c + ‖c‖²; ‖v‖² is constant across centroids, so
    // both argmin (assign, via Clustering.assignColumn — the ONE shared
    // definition the oracles replay) and the probe ordering only need
    // score(v,c) = ‖c‖² − 2 v·c — one fused dot per centroid, no per-row
    // diff array. ‖c‖² is precomputed driver-side.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("list_id", Clustering.assignColumn(col("_cv"), quantizer))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("list_id",
        explode(Clustering.probesColumn(col("_qv"), quantizer, nProbe)))
    val scored = c.join(broadcast(q), Seq("list_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("_cv"), col("_qv")))
    topK(scored, k)
  }

  /** Approximate top-k: score only within the query's bucket(s).
    * Same output contract as [[bruteForceTopK]]; recall < 1 by design.
    *
    * @param multiProbe 0 probes only the query's own bucket; 1 also
    *   probes every bucket at Hamming distance 1 (one hyperplane vote
    *   flipped) — the standard multi-probe LSH recall lever: a true
    *   neighbor lands in a different bucket exactly when it falls on the
    *   other side of a few hyperplanes, and single-bit flips cover the
    *   most likely misses for `planes`× more probe work on the QUERY side
    *   only (the corpus is still bucketed once; each pair can match in at
    *   most one probed bucket, so no dedup step is needed).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 12, seed: Long = 42L, multiProbe: Int = 0,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(multiProbe >= 0 && multiProbe <= 1,
      s"multiProbe supports 0 (own bucket) or 1 (Hamming-1), got $multiProbe")
    val c = lshBuckets(corpus, dim, planes, seed, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"), col("bucket"))
    val probes: Column =
      if (multiProbe == 0) array(col("bucket"))
      else array(col("bucket") +:
        (0 until planes).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*)
    val q = lshBuckets(queries, dim, planes, seed, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(probes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("_cv"), col("_qv")))
    topK(scored, k)
  }
}

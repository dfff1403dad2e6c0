package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over an embedding column (array<float>).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast of the query
  *    set + per-row lambda arithmetic (zip_with/aggregate — codegen'd, no
  *    UDF). The corpus is scanned once; correct baseline at any scale,
  *    O(corpus × queries) work.
  *  - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH. Signature bits
  *    from sign(v·r_i) with seeded deterministic hyperplanes; bucketed
  *    self-join gives the scale path — each probe only scores its bucket.
  *    Recall is tunable by `planes` (fewer planes → bigger buckets →
  *    higher recall, more work).
  */
object Similarity {

  /** v·w for two array<float/double> columns (codegen'd lambda). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

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
      .withColumn("cosine", cosine(col("_cv").cast("array<double>"),
        col("_qv").cast("array<double>")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** Deterministic random hyperplanes: `planes` × `dim` doubles. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Signature = bit b set iff v · r_b > 0; one long per row. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Attach an LSH bucket id to every row. */
  def lshBuckets(corpus: DataFrame, dim: Int, planes: Int = 12,
                 seed: Long = 42L, vecCol: String = "embedding"): DataFrame = {
    val hp = hyperplanes(dim, planes, seed)
    corpus.withColumn("bucket", signature(col(vecCol).cast("array<double>"), hp))
  }

  /** Approximate top-k: score only within the query's bucket.
    * Same output contract as [[bruteForceTopK]]; recall < 1 by design.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 12, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = lshBuckets(corpus, dim, planes, seed, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"), col("bucket"))
    val q = lshBuckets(queries, dim, planes, seed, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("_cv").cast("array<double>"),
        col("_qv").cast("array<double>")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }
}

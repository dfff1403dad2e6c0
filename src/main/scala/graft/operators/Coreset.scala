package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Greedy k-center / farthest-first traversal (Gonzalez 1985) — DIVERSITY
  * selection over an embedding column: pick k points such that every
  * point is close to some pick (2-approximation of the optimal k-center
  * cover). The training-data use: a diverse seed set for labeling, a
  * coreset for expensive downstream scoring, or "cover the embedding
  * space with k exemplars" dataset summarization — the complement of
  * [[Clustering.kMeans]] (which averages; k-center COVERS extremes).
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Distances run on the [[Quantize]] int8 grid, NOT raw floats: squared
  * L2 between int8 vectors is exact integer arithmetic in double space
  * (≤ 64·254² ≪ 2⁵³), so every argmax is deterministic, tie-broken on
  * vec_id, and replayed bit-for-bit by the SQL oracle. Symmetric
  * quantization normalizes per-vector magnitude (grid radius ≈ 127), so
  * the geometry is angular — the right metric for cosine-world
  * embeddings.
  *
  * Scale shape: the k-round loop is [[Clustering]]'s contract — each
  * round is ONE shuffle-free scan (codegen d² + TakeOrdered(1)) and the
  * driver sees exactly one row per round; the running min-distance
  * column updates in place with a `least(...)` projection (checkpointed
  * every 8 rounds to cap lineage). Total work O(n·k) — k is a model
  * hyperparameter (10²–10³); for larger k switch to k-means++
  * oversampling (k-means|| — [[Clustering]]'s seeding) instead of exact
  * farthest-first.
  */
object Coreset {

  private def litVec(a: Seq[Int]): Column = array(a.map(lit(_)): _*)

  /** Exact squared L2 on the int8 grid: |v|² + |c|² − 2·v·c as long. */
  private def d2To(vec: Column, center: Seq[Int]): Column = {
    val c2 = center.map(x => x.toLong * x).sum
    (VectorOps.dot(vec, vec) + lit(c2.toDouble)
      - lit(2.0d) * VectorOps.dot(vec, litVec(center))).cast("long")
  }

  /** The k selected centers in selection order: (rank, vec_id, d2_sel)
    * where d2_sel is the point's distance² to the already-selected set
    * at the moment it was chosen (rank 1 = lowest vec_id, d2_sel 0).
    * d2_sel is non-increasing in rank and d2_sel(k+1) would be the
    * coverage radius² — the selection sequence IS the cover-quality
    * curve.
    */
  def kCenters(emb: DataFrame, k: Int, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = Quantize.int8(emb, idCol, vecCol)
      .select(col(idCol).cast("long").as("vec_id"), col("qvec"))
      .localCheckpoint(false) // lazy: the seed head() below materializes it

    val seedRow = q.orderBy(col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("qvec")).head()
    val seedId = seedRow.getLong(0)
    val seedVec = seedRow.getSeq[Int](1)

    val picks = ArrayBuffer((1L, seedId, 0L))
    var state = q.withColumn("d2min", d2To(col("qvec"), seedVec))
    var i = 2
    while (i <= k) {
      val top = state.orderBy(col("d2min").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("d2min"), col("qvec")).head()
      picks += ((i.toLong, top.getLong(0), top.getLong(1)))
      state = state.withColumn("d2min",
        least(col("d2min"), d2To(col("qvec"), top.getSeq[Int](2))))
      if (i % 8 == 0) state = state.localCheckpoint(false) // next head() fills it
      i += 1
    }
    picks.toSeq.toDF("rank", "vec_id", "d2_sel")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded random sign projection (Achlioptas' database-friendly variant
  * of Johnson–Lindenstrauss): y_j = Σ_i s(j,i)·x_i with s ∈ {±1} drawn
  * deterministically from md5, scaled by 1/√outDim at read-out. The
  * standard embedding shrink before LSH banding, clustering, or index
  * shipping — JL says pairwise geometry survives to distortion
  * O(√(log n / outDim)), with NO training pass (unlike PCA) and no
  * stored model beyond (seed, dims). Beyond-reference surface
  * (SURVEY §2.13); composes with [[Quantize.int8]] for a further 4×.
  *
  * Determinism / engine portability:
  *  - the sign matrix derives from md5("proj:seed:j:i") at PLAN time
  *    (driver-side, no RNG object) and is inlined as array literals, so
  *    the same (seed, outDim, inDim) reproduces the same matrix anywhere
  *    — including inside the DuckDB oracle, which rebuilds it as a
  *    VALUES table from the same digests;
  *  - inputs are fixed to MICRO units first (round(x·1e6) → long), so
  *    each output coordinate is an exact INTEGER sum of ±vq_i —
  *    no float-order dependence on either engine, any association order.
  *
  * 100 TB shape: pure shuffle-free projection — outDim zip_with/
  * aggregate chains over codegen'd array lambdas, no explode, no join,
  * no driver data path. The matrix is outDim×inDim literals in the plan
  * (e.g. 32×1024 = 32k ints ≈ 128 KB — fine); for outDim beyond ~10³,
  * switch to the posexplode + broadcast-matrix-join formulation the
  * oracle uses (one partial-agg shuffle on (id, j)).
  */
object Projection {

  /** Deterministic ±1 from the first hex nibble of md5("proj:seed:j:i")
    * — nibble < 8 → +1. Computed driver-side; NOT an RNG call, so plans
    * stay resumable and the oracle replays it.
    */
  def signMatrix(seed: Long, outDim: Int, inDim: Int): IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val h = md.digest(s"proj:$seed:$j:$i".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) < 8) 1 else -1
      }
    }
  }

  /** Vector fixed to micro units: array<long>, q_i = round(x_i·1e6). */
  def microVec(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1e6).cast("long"))

  /** (idCol, proj_micro array<long> of outDim, proj array<double>):
    * proj_micro_j = Σ_i s(j,i)·round(x_i·1e6) — exact integers;
    * proj_j = round(proj_micro_j / 1e6 / √outDim, 6) is the JL-scaled
    * float rendering. Input vectors must have exactly `inDim` elements
    * (shorter arrays would silently zip to a truncated sum — guarded).
    */
  def projectSigns(corpus: DataFrame, outDim: Int, inDim: Int,
                   seed: Long = 42L, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(outDim >= 1 && inDim >= 1, s"bad dims $outDim x $inDim")
    val signs = signMatrix(seed, outDim, inDim)
    val vq = microVec(col(vecCol))
    val outCols: Seq[Column] = (0 until outDim).map { j =>
      val sRow = array(signs(j).map(s => lit(s.toLong)): _*)
      aggregate(zip_with(col("_vq"), sRow, (a, b) => a * b), lit(0L), _ + _)
    }
    val scale = 1e6 * math.sqrt(outDim.toDouble)
    corpus
      .select(col(idCol), vq.as("_vq"))
      .where(size(col("_vq")) === inDim)
      .select(col(idCol), array(outCols: _*).as("proj_micro"))
      .withColumn("proj", transform(col("proj_micro"),
        p => round(p.cast("double") / scale, 6)))
  }

  /** Brute-force cosine top-k in the PROJECTED space — same ranking
    * contract as [[Similarity.bruteForceTopK]] (6 dp round, id
    * tiebreak). Cosine is scale-invariant, so it runs directly on the
    * integer micro projections: no rescale, and the int dots are exact
    * in double. This is the cheap candidate generator; re-rank the
    * survivors in the original space for exact results.
    */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    outDim: Int, inDim: Int, seed: Long = 42L,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val c = projectSigns(corpus, outDim, inDim, seed, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("proj_micro").as("_cv"))
    val q = projectSigns(queries, outDim, inDim, seed, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("proj_micro").as("_qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        graft.functions.VectorOps.cosine(col("_cv"), col("_qv")))
    Similarity.topK(scored, k)
  }
}

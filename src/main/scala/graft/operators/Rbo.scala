package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-biased overlap (Webber–Moffat–Zobel 2010) — similarity of two
  * TOP-WEIGHTED rankings: RBO = (1−p)Σ p^(d−1)·(overlap@d / d), the
  * principled way to answer "did the ranker change ship a different
  * top-10" — Kendall/Spearman need conjoint full lists, set overlap
  * ignores order, while RBO weights disagreement at rank 1 heaviest
  * and converges for truncated lists. The ranking-regression guard for
  * every retrieval config change ([[Retrieval]] BM25/VSM, [[Mmr]],
  * fusion weights) next to nDCG's single-ranking quality.
  *
  * Truncated-at-k form with the standard residual extrapolation:
  * RBO@k = Σ_{d≤k} w_d·A_d + p^k·A_k (agreement assumed to persist).
  * Determinism: the geometric weights are NANO-quantized driver
  * constants ([[weights]] — shared verbatim with any replayer); each
  * term rounds once from an exact (weight × overlap)/d double, so the
  * per-query sum is an exact long.
  *
  * Scale shape: one equi-join of the two ranking frames (rank ≤ k each
  * — input frames are top-k-bounded by construction), a (query × depth)
  * census ≤ k rows per query, cumulative windows AT that census grain,
  * one partial-agg reduce per query. Queries ranked by only one side
  * still appear (RBO 0), via the union query frame.
  */
object Rbo {

  /** (per-depth nano weights w_1..w_k, residual nano weight p^k). */
  def weights(k: Int, pMicro: Long): (Seq[Long], Long) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(pMicro > 0 && pMicro < 1000000L,
      s"pMicro must be in (0, 1e6), got $pMicro")
    val p = pMicro / 1e6
    val wd = (1 to k).map(d =>
      Clustering.roundHalfAway((1 - p) * math.pow(p, d - 1) * 1e9))
    (wd, Clustering.roundHalfAway(math.pow(p, k) * 1e9))
  }

  /** (query, overlap_k, rbo): a and b are (query, item, rank) frames
    * with rank ∈ 1..k (rows past k are ignored defensively).
    */
  def rboAtK(a: DataFrame, b: DataFrame, k: Int,
             pMicro: Long): DataFrame = {
    val (wd, pk) = weights(k, pMicro)
    val spark = a.sparkSession
    import spark.implicits._
    def side(df: DataFrame, r: String) =
      df.select(col("query").cast("string").as("query"),
          col("item").cast("long").as("item"),
          col("rank").cast("long").as(r))
        .where(col(r) >= 1 && col(r) <= k)
    val sa = side(a, "ra")
    val sb = side(b, "rb")
    val queries = sa.select("query").unionByName(sb.select("query"))
      .distinct()
    val mCensus = sa.join(sb, Seq("query", "item"))
      .select(col("query"), greatest(col("ra"), col("rb")).as("m"))
      .groupBy("query", "m").agg(count(lit(1)).as("nm"))
    val grid = queries.crossJoin(
      broadcast((1 to k).map(_.toLong).toDF("d")))
    val w = Window.partitionBy("query").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wdLookup = element_at(
      map(wd.zipWithIndex.flatMap { case (v, i) =>
        Seq(lit((i + 1).toLong), lit(v)) }: _*), col("d"))
    val depth = grid
      .join(mCensus, col("m") === col("d") && mCensus("query") === grid("query"),
        "left_outer")
      .select(grid("query"), col("d"), coalesce(col("nm"), lit(0L)).as("nm"))
      .withColumn("ov", sum(col("nm")).over(w))
      .withColumn("term_nano",
        round(wdLookup.cast("double") * col("ov") / col("d"))
          .cast("long"))
      .withColumn("ext_nano",
        when(col("d") === k,
          round(lit(pk).cast("double") * col("ov") / col("d"))
            .cast("long")).otherwise(0L))
    depth.groupBy("query")
      .agg(max(when(col("d") === k, col("ov"))).as("overlap_k"),
        ((sum(col("term_nano")) + sum(col("ext_nano"))).cast("double")
          / lit(1e9)).as("rbo"))
  }
}

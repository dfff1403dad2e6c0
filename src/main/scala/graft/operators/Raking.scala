package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative proportional fitting (IPF / raking, Deming & Stephan 1940)
  * — mixture reweighting to TARGET MARGINALS on two dimensions at once,
  * the corpus-balancing step [[HashSplit.mixtureUpsample]] and the
  * temperature mix can't express: "make the language shares uniform AND
  * the source shares uniform simultaneously" has no closed-form
  * per-cell factor (the dimensions interact), but alternating
  * proportional scaling converges to the unique minimum-KL reweighting
  * with both marginals on target. Beyond-reference surface (SURVEY
  * §2.13).
  *
  * Everything runs at CELL grain — the (dimA, dimB) census, never rows:
  * a 100 TB corpus with 100 languages × 10⁶ domains is at most 10⁸
  * cells, and each half-round is one partial-agg shuffle over cells
  * plus a broadcast factor join. Zero driver data path.
  *
  * Weights are MICRO units (long, 1.0 ≡ 1e6), updated with exactly ONE
  * double operation chain per cell per half-round —
  * w' = round(w · target/current) — the [[PageRank]] quantization
  * pattern, so every half-round is association-order-free and the
  * whole loop replays in the external SQL oracle. Weighted cell masses
  * (cnt · w) stay below 2⁶³ up to ~9·10¹² rows per marginal at
  * converged weights ~1e6; beyond that, pre-scale counts (documented,
  * same contract as the PCA census).
  *
  * Targets here are UNIFORM over each dimension's present values (the
  * common "balance the corpus" ask); a non-uniform target is the same
  * loop with a target-share column joined in place of 1/|dim|.
  */
object Raking {

  /** Cell census of `docs` on (dimA, dimB): (a, b, cnt). */
  def cells(docs: DataFrame, dimA: String, dimB: String): DataFrame =
    docs.groupBy(col(dimA).as("a"), col(dimB).as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** IPF over a cell census: returns (a, b, cnt, weight_micro, weight,
    * adj_cnt) after `iterations` full rounds (each = scale-to-target on
    * dim A, then on dim B). adj_cnt = round(cnt·w) is the reweighted
    * cell mass a resampler consumes.
    */
  def fit(cellCensus: DataFrame, iterations: Int = 3,
          checkpointEvery: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val base = cellCensus.select("a", "b", "cnt").localCheckpoint()
    // totals: N, |A|, |B| — one tiny broadcast frame, reused every round
    val tot = base.agg(sum(col("cnt")).as("n"),
      count_distinct(col("a")).as("na"),
      count_distinct(col("b")).as("nb"))

    var w = base.withColumn("w", lit(1000000L))
    var i = 1
    while (i <= iterations) {
      for (dim <- Seq("a", "b")) {
        val nd = if (dim == "a") "na" else "nb"
        val cur = w.groupBy(dim).agg(sum(col("cnt") * col("w")).as("cur"))
        w = w.join(cur, Seq(dim))
          .crossJoin(broadcast(tot))
          // ONE double chain, identical association in the oracle:
          // target mass per dim value = n·1e6/|dim|
          .withColumn("w",
            round(col("w") * (col("n") * lit(1e6) / col(nd)) / col("cur"))
              .cast("long"))
          .select("a", "b", "cnt", "w")
      }
      if (i % checkpointEvery == 0) w = w.localCheckpoint()
      i += 1
    }
    w.select(col("a"), col("b"), col("cnt"), col("w").as("weight_micro"),
      round(col("w").cast("double") / 1e6, 6).as("weight"),
      round(col("cnt") * col("w") / lit(1e6)).cast("long").as("adj_cnt"))
  }

  /** Post-fit marginal check: per-dim achieved share in micro units —
    * the convergence evidence (each share approaches 1e6/|dim|).
    */
  def marginals(fitted: DataFrame, dim: String): DataFrame = {
    val tot = fitted.agg(sum(col("cnt") * col("weight_micro")).as("t"))
    fitted.groupBy(dim)
      .agg(sum(col("cnt") * col("weight_micro")).as("mass"))
      .crossJoin(broadcast(tot))
      .select(col(dim),
        round(col("mass") * lit(1e6) / col("t")).cast("long")
          .as("share_micro"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Platt scaling (Platt 1999; Lin–Weng–Keerthi): fit σ(A·s + B) to
  * binary labels by Newton's method on the regularized log-loss — the
  * PARAMETRIC calibration next to [[Calibration]]'s isotonic/PAV
  * (monotone nonparametric) and the reliability diagram: two
  * parameters mean it extrapolates smoothly beyond the score range and
  * never overfits sparse bins, which is what a margin-style classifier
  * score (the NB micro-log-odds) wants before its scores are used as
  * probabilities. Uses Platt's smoothed targets t⁺ = (N⁺+1)/(N⁺+2),
  * t⁻ = 1/(N⁻+2) (the MAP prior that keeps fitted probabilities off
  * 0/1) and the standard init A = 0, B = ln((N⁻+1)/(N⁺+1)).
  *
  * Determinism contract (the warm-k-means discipline): the fit runs on
  * the (score, n_pos, n_neg) CENSUS; each Newton round's gradient and
  * Hessian entries are micro-rounded PER CENSUS ROW AND CLASS, then
  * count-weighted — exact long sums; (A, B) snap to the micro grid
  * between rounds, so any engine replaying the same integers lands on
  * identical parameters. The 1e6 scalings cancel in the 2×2 solve
  * (µ²/µ²), so the update ratio is computed directly from the micro
  * longs. Singular Hessians (degenerate single-score censuses) keep
  * the previous parameters instead of dividing by zero.
  *
  * Scale shape: one shuffle to the score census (cached), then per
  * round ONE partial-agg job collecting a 5-value gradient/Hessian row
  * — driver traffic is 5 longs per round, the corpus is scanned never
  * re-shuffled. Output one row.
  */
object Platt {

  /** One row: (n_pos, n_neg, a_micro, b_micro, logloss) — σ(A·s+B)
    * fitted over `rounds` Newton steps on (scoreMicro, label); logloss
    * is the mean negative log-likelihood of the CALIBRATED
    * probabilities against the hard labels, micro-rounded per census
    * row (exact long sum, one final division).
    */
  def fit(df: DataFrame, scoreMicro: Column, label: Column,
          rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val census = df.select(scoreMicro.cast("long").as("sm"),
        when(label, 1L).otherwise(0L).as("y"))
      .groupBy("sm")
      .agg(sum(col("y")).as("np"),
        sum(lit(1L) - col("y")).as("nn"))
      .localCheckpoint(false) // lazy: the totals head() below materializes it
    val tot = census.agg(sum("np"), sum("nn")).head()
    val nPos = tot.getLong(0)
    val nNeg = tot.getLong(1)
    require(nPos > 0 && nNeg > 0, "both classes must be present")
    val tPos = (nPos + 1.0) / (nPos + 2.0)
    val tNeg = 1.0 / (nNeg + 2.0)
    var aM = 0L
    var bM = Clustering.roundHalfAway(
      math.log((nNeg + 1.0) / (nPos + 1.0)) * 1e6)

    // p at the CURRENT micro params; s = sm/1e6 (exact division)
    def pCol(aMicro: Long, bMicro: Long): Column = {
      val z = lit(aMicro.toDouble) / lit(1e6) *
        (col("sm").cast("double") / lit(1e6)) +
        lit(bMicro.toDouble) / lit(1e6)
      lit(1.0d) / (lit(1.0d) + exp(-z))
    }
    // micro-round one census-row term -> exact long
    def mic(term: Column): Column = round(term * lit(1e6)).cast("long")

    for (_ <- 1 to rounds) {
      val p = pCol(aM, bM)
      val s = col("sm").cast("double") / lit(1e6)
      val sums = census.select(
        (mic((p - lit(tPos)) * s) * col("np")
          + mic((p - lit(tNeg)) * s) * col("nn")).as("g1"),
        (mic(p - lit(tPos)) * col("np")
          + mic(p - lit(tNeg)) * col("nn")).as("g2"),
        (mic(p * (lit(1.0d) - p) * s * s) * (col("np") + col("nn")))
          .as("h11"),
        (mic(p * (lit(1.0d) - p) * s) * (col("np") + col("nn")))
          .as("h12"),
        (mic(p * (lit(1.0d) - p)) * (col("np") + col("nn"))).as("h22"))
        .agg(sum("g1"), sum("g2"), sum("h11"), sum("h12"), sum("h22"))
        .head()
      val (g1, g2, h11, h12, h22) = (sums.getLong(0), sums.getLong(1),
        sums.getLong(2), sums.getLong(3), sums.getLong(4))
      val det = h11.toDouble * h22 - h12.toDouble * h12
      if (det != 0.0) {
        aM = Clustering.roundHalfAway(
          (aM / 1e6 - (h22.toDouble * g1 - h12.toDouble * g2) / det) * 1e6)
        bM = Clustering.roundHalfAway(
          (bM / 1e6 - (h11.toDouble * g2 - h12.toDouble * g1) / det) * 1e6)
      }
    }

    val pF = pCol(aM, bM)
    val ll = census.select(
        (round(-log(pF) * lit(1e6)).cast("long") * col("np")
          + round(-log(lit(1.0d) - pF) * lit(1e6)).cast("long")
            * col("nn")).as("llm"))
      .agg(sum("llm").as("ll_sum"))
    ll.select(lit(nPos).as("n_pos"), lit(nNeg).as("n_neg"),
      lit(aM).as("a_micro"), lit(bM).as("b_micro"),
      (col("ll_sum").cast("double")
        / (lit(1e6) * lit((nPos + nNeg).toDouble))).as("logloss"))
  }
}

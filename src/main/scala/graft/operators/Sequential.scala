package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anytime-valid sequential monitoring via a betting e-process (test
  * martingale — Wald's SPRT likelihood ratio in its modern e-value
  * reading: Ramdas et al., "Game-theoretic statistics", 2023): the
  * fixed-horizon z-test ([[EventAnalytics]]' A/B gate) is only valid at
  * its planned n — peeking at every batch inflates false positives —
  * while an e-process supports CONTINUOUS monitoring: reject H₀ the
  * moment E_t ≥ 1/α, with anytime validity by Ville's
  * inequality (P[sup E_t ≥ 1/α] ≤ α under H₀). This is the correct
  * primitive for a pipeline that checks "has this arm's success rate
  * regressed" after every daily batch.
  *
  * H₀: rate ≤ p₀, alternative p₁ > p₀. Each observation multiplies the
  * e-value by (p₁/p₀)^x · ((1−p₁)/(1−p₀))^(1−x), so log E_t is a
  * WEIGHTED COUNT: successes · ln(p₁/p₀) + failures · ln((1−p₁)/(1−p₀)).
  * Both log-LR constants are micro-quantized ONCE on the driver (exact
  * integers thereafter — the census-constant convention), so the whole
  * monitor is integer arithmetic: no float accumulation across time,
  * bit-identical on any engine, and mergeable (partial sums add).
  *
  * Scale shape: one partial-aggregable shuffle to (arm × bucket)
  * census grain, then a cumulative window over BUCKETS within each arm
  * — census grain by construction (hours/days, not events), the only
  * place the repo allows a full-history window. Driver traffic: the
  * two constants in, nothing out.
  */
object Sequential {

  /** The three integers the whole monitor runs on: per-success and
    * per-failure log-likelihood-ratio increments and the rejection
    * threshold ln(1/α), each micro-quantized half-away-from-zero.
    * Exposed so an external replayer (the DuckDB oracle) can bake the
    * SAME integers and match bit-for-bit by construction.
    */
  final case class EConstants(winMicro: Long, loseMicro: Long,
                              threshMicro: Long)

  def constants(p0: Double, p1: Double, alpha: Double): EConstants = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 > p0,
      s"need 0 < p0 < p1 < 1, got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    EConstants(
      Clustering.roundHalfAway(math.log(p1 / p0) * 1e6),
      Clustering.roundHalfAway(math.log((1 - p1) / (1 - p0)) * 1e6),
      Clustering.roundHalfAway(math.log(1 / alpha) * 1e6))
  }

  /** Per (arm, bucket): n, successes, cumulative log-e (micro), and
    * the running anytime-valid verdict `rejected` (true from the first
    * bucket where log E_t ≥ ln(1/α) onward — rejection is sticky: an
    * e-process verdict, once made at level α, stands).
    */
  def bernoulliEValue(df: DataFrame, arm: Column, bucket: Column,
                      success: Column, p0: Double, p1: Double,
                      alpha: Double): DataFrame = {
    val EConstants(winMicro, loseMicro, threshMicro) =
      constants(p0, p1, alpha)
    val census = df
      .groupBy(arm.as("arm"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("successes"))
    val w = Window.partitionBy("arm").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    census
      .withColumn("loge_micro",
        sum(col("successes") * lit(winMicro) +
          (col("n") - col("successes")) * lit(loseMicro)).over(w))
      .withColumn("rejected",
        max(when(col("loge_micro") >= lit(threshMicro), 1L).otherwise(0L))
          .over(w) === 1L)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two snapshots of the same
  * feature — the retrain/rollback trigger of a production data
  * pipeline (did yesterday's corpus shift against the training
  * baseline?). Beyond-reference surface (SURVEY §2.13).
  */
object Drift {

  /** Population Stability Index over a FIXED histogram grid (the grid
    * must be pinned, not data-derived — else the metric drifts with
    * the data it measures): PSI = Σ_buckets (q_i − p_i)·ln(q_i/p_i),
    * p from `expected`, q from `actual`. Zero cells take the standard
    * 0.5 pseudo-count (p_i = max(cnt, 0.5)/N) so empty buckets don't
    * produce ±∞. Per-bucket terms are micro-quantized (round to 1e-6)
    * BEFORE the total, so the sum is an exact integer and the scalar
    * replays — the usual association-order rule; PSI's decision
    * thresholds (0.1 / 0.25) sit 5 orders of magnitude above the
    * quantization.
    *
    * Two census-grain aggregations; the raw tables are scanned once
    * each. Output: per-bucket rows (bucket, n_expected, n_actual,
    * term) — [[psiTotal]] folds them to the scalar.
    */
  def psi(expected: DataFrame, actual: DataFrame, value: Column,
          lo: Double, hi: Double, buckets: Int): DataFrame = {
    val he = HistQuantile.histogram(expected, value, lo, hi, buckets)
      .select(col("bucket"), col("cnt").as("n_expected"))
    val ha = HistQuantile.histogram(actual, value, lo, hi, buckets)
      .select(col("bucket"), col("cnt").as("n_actual"))
    val joined = he.join(ha, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_expected", "n_actual"))
    val tot = joined.agg(sum(col("n_expected")).as("ne"),
      sum(col("n_actual")).as("na"))
    val p = greatest(col("n_expected").cast("double"), lit(0.5)) / col("ne")
    val q = greatest(col("n_actual").cast("double"), lit(0.5)) / col("na")
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_expected"), col("n_actual"),
        round((q - p) * log(q / p) * 1e6).cast("long").as("term_micro"))
  }

  /** The PSI scalar from [[psi]]'s bucket frame: exact integer sum of
    * the micro terms, rounded back to 6dp.
    */
  def psiTotal(bucketFrame: DataFrame): DataFrame =
    bucketFrame.agg(
      round(sum(col("term_micro")).cast("double") / 1e6, 6).as("psi"))
}

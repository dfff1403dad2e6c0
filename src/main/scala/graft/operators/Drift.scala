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

  /** KL and Jensen–Shannon divergence between two corpora's unigram
    * TOKEN distributions — the content-mix twin of [[psi]]'s
    * fixed-grid value drift: PSI watches a scalar feature, this
    * watches what the text is made of (language mix shifts, template
    * floods, topic collapse between corpus versions or mixture
    * sources). Distributions are add-one smoothed over the JOINT
    * vocabulary, so both KL directions are finite and JS is bounded by
    * ln 2.
    *
    * Portability: p = (c_a+1)/(N_a+V) and q likewise are single
    * deterministic double divisions from exact census longs; each
    * term p·ln(p/q) nano-rounds BEFORE the sum (ln is the only libm
    * call, rounded per term — the [[psi]] rule), so the three scalars
    * replay exactly. Scale shape: one token-census shuffle per side
    * (partial-aggregated map-side), a vocabulary-grain full-outer
    * join, one broadcast totals row — never corpus-grain after the
    * census.
    *
    * Output one row: (n_terms, kl_ab, kl_ba, js).
    */
  def tokenDivergence(a: DataFrame, b: DataFrame,
                      textCol: String = "text"): DataFrame = {
    def census(df: DataFrame, cnt: String): DataFrame =
      df.select(explode(TextAnalysis.tokens(
          TextAnalysis.normalized(col(textCol)))).as("term"))
        .where(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as(cnt))
    val j = census(a, "ca").join(census(b, "cb"), Seq("term"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val tot = j.agg(count(lit(1)).as("v"), sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"))
    val p = (col("ca") + lit(1L)).cast("double") / (col("na") + col("v"))
    val q = (col("cb") + lit(1L)).cast("double") / (col("nb") + col("v"))
    val m = (p + q) / lit(2.0d)
    j.crossJoin(broadcast(tot))
      .select(col("v"),
        round(p * log(p / q) * 1e9).cast("long").as("kab"),
        round(q * log(q / p) * 1e9).cast("long").as("kba"),
        round((p * log(p / m) + q * log(q / m)) / lit(2.0d) * 1e9)
          .cast("long").as("jst"))
      .groupBy("v")
      .agg(round(sum(col("kab")).cast("double") / 1e9, 6).as("kl_ab"),
        round(sum(col("kba")).cast("double") / 1e9, 6).as("kl_ba"),
        round(sum(col("jst")).cast("double") / 1e9, 6).as("js"))
      .select(col("v").as("n_terms"), col("kl_ab"), col("kl_ba"), col("js"))
  }
}

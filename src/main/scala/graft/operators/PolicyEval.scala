package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Off-policy evaluation from logged interaction data — inverse
  * propensity scoring (Horvitz–Thompson / IPS), its self-normalized
  * variant (SNIPS), and the effective sample size: "what reward WOULD
  * the candidate policy have earned on last month's logged traffic"
  * answered without serving it. The curation/RLHF use: compare ranking
  * or sampling policies offline before an A/B slot is spent; ESS says
  * whether the logged policy even covers the candidate enough for the
  * answer to mean anything (ESS ≪ n_matched ⇒ a few huge weights own
  * the estimate). Beyond-reference surface (SURVEY §2.13).
  *
  *   IPS   = (1/n) Σ 1{a_i = π(x_i)} · r_i / p_i
  *   SNIPS = Σ 1{·} w_i r_i / Σ 1{·} w_i,   w_i = 1/p_i
  *   ESS   = (Σ 1{·} w_i)² / Σ 1{·} w_i²
  *
  * Exactness: propensities and rewards arrive in micro units
  * (contract-guarded: 0 < p ≤ 1e6, r ≥ 0 — a negative reward would mix
  * truncation and floor division across engines; shift upstream). Each
  * weight is the round-half-up INTEGER division (2·10¹² + p) div (2p)
  * — no libm — and all accumulations are exact DECIMAL(38,0) sums of
  * integer products; the three output ratios are one rounded double
  * chain each (the (Σw)² square is taken in double — same op order in
  * the oracle). One partial-agg shuffle to a single row; no windows.
  *
  * Output: (n, n_matched, ips, snips, ess).
  */
object PolicyEval {

  /** `logs`: (matched boolean — logged action equals the candidate
    * policy's action, propensity_micro, reward_micro).
    */
  def offPolicyValue(logs: DataFrame): DataFrame = {
    val pm = col("propensity_micro").cast("long")
    val rm = col("reward_micro").cast("long")
    val pG = when(pm > 0 && pm <= 1000000L, pm).otherwise(raise_error(concat(
      lit("offPolicyValue requires propensity_micro in (0, 1e6], got "),
      pm.cast("string"))))
    val rG = when(rm >= 0, rm).otherwise(raise_error(concat(
      lit("offPolicyValue requires reward_micro >= 0, got "),
      rm.cast("string"))))
    val base = logs.select(col("matched").cast("boolean").as("m"),
        pG.as("p"), rG.as("r"))
      .withColumn("w", expr("(2 * 1000000000000 + p) div (2 * p)"))
    base.agg(
        count(lit(1)).as("n"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("m"), col("w").cast("decimal(38,0)") * col("r"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("swr"),
        sum(when(col("m"), col("w").cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("sw"),
        sum(when(col("m"), col("w").cast("decimal(38,0)") * col("w"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("sww"))
      .select(col("n"), col("n_matched"),
        when(col("n") > 0,
          round(col("swr").cast("double") / col("n") / 1e12, 6)).as("ips"),
        when(col("sw") > 0,
          round(col("swr").cast("double") / col("sw").cast("double") / 1e6, 6))
          .as("snips"),
        when(col("sww") > 0,
          round(col("sw").cast("double") * col("sw").cast("double")
            / col("sww").cast("double"), 6)).as("ess"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Difference-in-differences — the quasi-experimental estimator for
  * rollouts that CANNOT be randomized (a policy flips for one cohort at
  * a date): under parallel trends, the treated group's post−pre change
  * minus the control group's post−pre change isolates the effect from
  * both group-level baselines and period-level shocks, which a naive
  * post-only comparison confounds. Completes the experimentation
  * family: [[EventAnalytics.abTest]] (randomized proportions),
  * [[Cuped]] (randomized means, variance-reduced), DiD (observational
  * two-period rollouts).
  *
  * DiD = (ȳ_t1 − ȳ_t0) − (ȳ_c1 − ȳ_c0) from the 2×2 cell census; the
  * large-sample SE is √(Σ s²_g/n_g) over the four cells (the
  * unpooled/Welch form — the same 2×2 OLS interaction's robust SE).
  * All sums are exact DECIMAL(38,0) (the [[Cuped]] convention); cell
  * means micro-round once; SE, z and the A&S-Φ p are the only double
  * chain, rounded once. Any cell with < 2 rows → null SE/z/p (the
  * estimate itself needs just 1 row per cell).
  *
  * Scale shape: ONE partial-aggregable shuffle to a 4-row census —
  * count/sum/sum-of-squares per (treated, post) cell — then driver-free
  * census algebra. No windows, no collect.
  */
object Did {

  /** One row: (n_c0, n_c1, n_t0, n_t1, m_c0..m_t1 micro means,
    * did_micro, se, z, p_value). `outcome` must be integer-valued
    * (micro/cents upstream).
    */
  def estimate(df: DataFrame, treated: Column, post: Column,
               outcome: Column): DataFrame = {
    val base = df.select(
      when(treated, 1).otherwise(0).as("g"),
      when(post, 1).otherwise(0).as("p"),
      outcome.cast("long").as("y"))
    val cells = base.groupBy("g", "p").agg(
      count(lit(1)).as("n"),
      sum(col("y").cast("decimal(38,0)")).as("s"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("q"))
    // pivot the 4 cells into one row: census-grain conditional sums
    def cell(g: Int, p: Int, c: String) =
      sum(when(col("g") === g && col("p") === p, col(c))).as(s"${c}_$g$p")
    val row = cells.agg(
      cell(0, 0, "n"), cell(0, 1, "n"), cell(1, 0, "n"), cell(1, 1, "n"),
      cell(0, 0, "s"), cell(0, 1, "s"), cell(1, 0, "s"), cell(1, 1, "s"),
      cell(0, 0, "q"), cell(0, 1, "q"), cell(1, 0, "q"), cell(1, 1, "q"))
    def m(g: Int, p: Int): Column =
      round(col(s"s_$g$p").cast("double") * lit(1e6)
        / col(s"n_$g$p").cast("double")).cast("long")
    def v(g: Int, p: Int): Column = {
      val n = col(s"n_$g$p"); val s = col(s"s_$g$p"); val q = col(s"q_$g$p")
      when(n >= 2,
        (n.cast("decimal(38,0)") * q - s * s).cast("double")
          / (n.cast("double") * (n.cast("double") - lit(1.0d))))
    }
    row
      .withColumn("m_c0", m(0, 0)).withColumn("m_c1", m(0, 1))
      .withColumn("m_t0", m(1, 0)).withColumn("m_t1", m(1, 1))
      .withColumn("did_micro",
        (col("m_t1") - col("m_t0")) - (col("m_c1") - col("m_c0")))
      .withColumn("se",
        sqrt(v(0, 0) / col("n_00") + v(0, 1) / col("n_01")
          + v(1, 0) / col("n_10") + v(1, 1) / col("n_11")))
      .withColumn("z",
        when(col("se") > 0,
          round(col("did_micro").cast("double") / lit(1e6) / col("se"), 6)))
      .withColumn("p_value",
        // guard on z: least() IGNORES nulls (both engines), so an
        // unguarded chain would turn a null z into p = 1.0
        when(col("z").isNotNull,
          round(least(lit(1.0d), lit(2.0d)
            * (lit(1.0d) - Hypothesis.normCdf(abs(col("z"))))), 6)))
      .withColumn("se", round(col("se"), 6))
      .select(
        col("n_00").as("n_c0"), col("n_01").as("n_c1"),
        col("n_10").as("n_t0"), col("n_11").as("n_t1"),
        col("m_c0"), col("m_c1"), col("m_t0"), col("m_t1"),
        col("did_micro"), col("se"), col("z"), col("p_value"))
  }
}

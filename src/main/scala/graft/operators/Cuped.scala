package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance reduction for A/B tests (Deng, Xu, Kohavi, Walker —
  * WSDM 2013): adjust each unit's experiment-period metric Y by its
  * PRE-period covariate X, Y' = Y − θ·X with θ = Cov(X,Y)/Var(X)
  * pooled across arms, and z-test the adjusted means. Pre-period
  * behavior explains most between-user variance, so the same traffic
  * detects effects 30–50% smaller — the production refinement of
  * [[EventAnalytics]]'s plain two-proportion z-test. Beyond-reference
  * surface (SURVEY §2.13).
  *
  * Exactness: X and Y arrive as micro longs (quantize per event BEFORE
  * summing — double sums are association-order-dependent). θ's
  * numerator n·Sxy − Sx·Sy and denominator n·Sxx − Sx² are exact
  * DECIMAL(38,0) census sums; θ rounds once (6dp). The adjustment
  * DROPS the usual +θ·X̄ recentering term — it is a constant, so the
  * arm-mean DIFFERENCE, the variances, and z are unchanged, and
  * skipping it keeps the chain division-free until the end. Each
  * unit's adjusted value micro-rounds back to a long, so arm sums and
  * squared sums are exact again; the Welch z and its A&S-Φ p are the
  * only double chain, rounded once. Degenerate inputs (Var(X) = 0 →
  * θ = 0 by contract; an arm with < 2 units → null z).
  *
  * Scale shape: one unit-grain shuffle to build (arm, x, y), then
  * census-grain aggregates only (5 pooled sums + 3 per arm); no
  * windows, no driver data path. Output one row: (n_a, n_b, theta,
  * z_raw, z_adj, p_adj, var_ratio) — var_ratio = pooled adjusted /
  * raw variance, the realized reduction (≈ 1 − ρ²).
  */
object Cuped {

  /** `units`: one row per experiment unit — (arm ∈ {0, 1}, x_micro,
    * y_micro). Returns the one-row verdict frame.
    */
  def zTest(units: DataFrame): DataFrame = {
    val u = units.select(col("arm").cast("int").as("arm"),
      col("x_micro").cast("long").as("x"),
      col("y_micro").cast("long").as("y"))
    val pooled = u.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
    val theta = pooled.select(
      when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
        .otherwise(lit(0.0d)).as("theta"))
    val adj = u.crossJoin(broadcast(theta))
      .withColumn("yadj", col("y") - round(col("theta") * col("x")).cast("long"))
    def armStats(vCol: String) = adj.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col(vCol).cast("decimal(38,0)")).as("s"),
      sum(col(vCol).cast("decimal(38,0)") * col(vCol)).as("q"))
    def wide(stats: DataFrame, tag: String): DataFrame = stats
      .groupBy()
      .agg(
        max(when(col("arm") === 0, col("n"))).as(s"n_a"),
        max(when(col("arm") === 1, col("n"))).as(s"n_b"),
        max(when(col("arm") === 0, col("s"))).as(s"sa"),
        max(when(col("arm") === 1, col("s"))).as(s"sb"),
        max(when(col("arm") === 0, col("q"))).as(s"qa"),
        max(when(col("arm") === 1, col("q"))).as(s"qb"))
      .withColumn("va", armVar(col("n_a"), col("sa"), col("qa")))
      .withColumn("vb", armVar(col("n_b"), col("sb"), col("qb")))
      .withColumn(s"z_$tag",
        when(col("va").isNotNull && col("vb").isNotNull &&
          col("va") / col("n_a") + col("vb") / col("n_b") > 0,
          round((col("sa").cast("double") / col("n_a")
            - col("sb").cast("double") / col("n_b"))
            / sqrt(col("va") / col("n_a") + col("vb") / col("n_b")), 6)))
      .withColumn(s"vp_$tag", // pooled variance for the reduction ratio
        when(col("va").isNotNull && col("vb").isNotNull,
          ((col("n_a") - 1) * col("va") + (col("n_b") - 1) * col("vb"))
            / (col("n_a") + col("n_b") - 2)))
      .select(col("n_a"), col("n_b"), col(s"z_$tag"), col(s"vp_$tag"))
    val raw = wide(armStats("y"), "raw")
    val ad = wide(armStats("yadj"), "adj")
    raw.crossJoin(ad.select(col("z_adj"), col("vp_adj")))
      .crossJoin(broadcast(theta))
      .select(col("n_a"), col("n_b"), col("theta"), col("z_raw"),
        col("z_adj"),
        when(col("z_adj").isNotNull,
          round(least(lit(1.0d),
            lit(2.0d) * (lit(1.0d) - Hypothesis.normCdf(abs(col("z_adj"))))),
            6)).as("p_adj"),
        when(col("vp_raw") > 0 && col("vp_adj").isNotNull,
          round(col("vp_adj") / col("vp_raw"), 6)).as("var_ratio"))
  }

  /** Unbiased per-arm variance (n·Q − S²)/(n(n−1)) as a double; null
    * below 2 units.
    */
  private def armVar(n: org.apache.spark.sql.Column,
                     s: org.apache.spark.sql.Column,
                     q: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(n >= 2,
      (n.cast("decimal(38,0)") * q - s * s).cast("double")
        / (n.cast("double") * (n.cast("double") - lit(1.0d))))
}

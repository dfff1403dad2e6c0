package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the forensic data-quality screen for
  * any organically-grown positive quantity (prices, populations, file
  * sizes, transaction amounts): real multiplicative processes put
  * digit d first with probability log₁₀(1 + 1/d) (30.1% of values
  * start with 1), while fabricated, clipped, or unit-mangled data
  * doesn't. A cheap upstream tripwire before a corrupted amounts
  * column poisons downstream aggregates.
  *
  * Determinism: the first digit is taken from the DECIMAL STRING of
  * the positive long (never via log10 — libm log10 at exact powers of
  * ten is a known cross-engine boundary hazard); expected shares are
  * driver micro constants ([[expectedMicro]], shared verbatim with any
  * replayer), so expected counts e_micro = n·p_micro are exact longs
  * and each χ² term is one (DECIMAL(38,0)-squared, double-divided)
  * rounded chain.
  *
  * Scale: one partial-aggregable shuffle to the 9-row digit census;
  * the χ² total is a window over those 9 rows — census grain by
  * construction. Non-positive values are excluded (Benford is only
  * defined on positives) and reported via the n_excluded column.
  */
object Benford {

  /** p_d · 1e6 for d = 1..9 — log₁₀(1 + 1/d), micro-quantized once. */
  val expectedMicro: Map[Int, Long] = (1 to 9).map { d =>
    d -> Clustering.roundHalfAway(math.log10(1.0 + 1.0 / d) * 1e6)
  }.toMap

  /** 9 rows: (digit, n, n_total, n_excluded, p_exp_micro, e_micro,
    * chi2_term, chi2) — observed first-digit counts of the positive
    * values of `value` (cast to long upstream semantics: truncation),
    * exact expected micro counts, per-digit χ² terms and the audit
    * total. Digits with zero observations still appear (the census is
    * densified against 1..9 — a missing digit is the loudest signal).
    */
  def firstDigit(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(value.cast("long").as("v"))
    val pos = v.where(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("int")
        .as("digit"))
    val census = pos.groupBy("digit").agg(count(lit(1)).as("n"))
    val dense = (1 to 9).toDF("digit")
      .join(census, Seq("digit"), "left_outer")
      .na.fill(0L, Seq("n"))
    val excluded = v.agg(
      sum(when(col("v") <= 0 || col("v").isNull, 1L).otherwise(0L))
        .as("n_excluded"))
    val pExp: Column = element_at(
      map(expectedMicro.toSeq.sortBy(_._1)
        .flatMap { case (d, p) => Seq(lit(d), lit(p)) }: _*),
      col("digit"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // term·1e6 = (n·1e6 − e_micro)²/e_micro: the DECIMAL square is
    // exact, ONE double division, micro-rounded — so the audit total is
    // an exact long sum, immune to float summation order
    val d = (col("n") * lit(1000000L) - col("e_micro"))
      .cast("decimal(38,0)")
    dense.crossJoin(broadcast(excluded))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .withColumn("p_exp_micro", pExp)
      .withColumn("e_micro", col("n_total") * col("p_exp_micro"))
      .withColumn("term_micro",
        when(col("e_micro") > 0,
          round((d * d).cast("double") / col("e_micro").cast("double"))
            .cast("long")))
      .withColumn("chi2_term", col("term_micro").cast("double") / lit(1e6))
      .withColumn("chi2",
        sum(col("term_micro")).over(wAll).cast("double") / lit(1e6))
      .select("digit", "n", "n_total", "n_excluded", "p_exp_micro",
        "e_micro", "chi2_term", "chi2")
  }
}

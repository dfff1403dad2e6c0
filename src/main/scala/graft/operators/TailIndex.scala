package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hill tail-index estimator (Hill 1975) — HOW heavy a heavy tail is:
  * for the top k order statistics, γ̂ = (1/k)Σ ln(x_(i)/x_(k+1)) and
  * α̂ = 1/γ̂, the Pareto exponent. The capacity-planning number behind
  * every skew decision in this repo: α ≤ 1 means even the MEAN is
  * infinite (one key can dominate any aggregate), α ≤ 2 means infinite
  * variance (sample means converge brutally slowly), α > 2 means
  * salting/AQE is enough. [[Zipf]] fits the rank-frequency law of a
  * categorical census; Hill measures the tail of a VALUE distribution
  * (degrees, token counts, file sizes) where only the extreme order
  * statistics carry the information.
  *
  * Determinism: the threshold t = the exact (n−k)-th smallest value via
  * [[HistQuantile.exactKth]] (census narrowing, no global sort). Tie
  * semantics are explicit: the tail set is {v : v > t} with m = its
  * exact count (ties AT t are excluded — m ≤ k always, and m < k only
  * under ties). Each log term ln(v/t) is micro-rounded PER ROW, so the
  * tail sum is an exact long — no float accumulation order; γ̂ and α̂
  * are single exact-integer divisions.
  *
  * Scale: exactKth's ≤5 census passes + ONE literal-filter scan whose
  * partial agg carries (count, micro-sum). Driver traffic: census rows
  * + the threshold.
  */
object TailIndex {

  /** One row: (n, k, threshold, m, gamma, alpha) over the positive
    * values of `value`; k is the intended tail size (1 ≤ k < n).
    * Degenerate all-ties tails (m = 0) yield null γ̂/α̂.
    */
  def hill(df: DataFrame, value: Column, k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = df.select(value.cast("long").as("v")).where(col("v") > 0)
      .localCheckpoint(false) // lazy: the count() below materializes it
    val n = v.count()
    require(k < n, s"k=$k must be < n=$n positive values")
    val t = HistQuantile.exactKth(v, col("v"), n - k).head().getLong(2)
    v.where(col("v") > t)
      .select(round(lit(1e6)
        * log(col("v").cast("double") / lit(t.toDouble)))
        .cast("long").as("term"))
      .agg(count(lit(1)).as("m"), sum(col("term")).as("sum_micro"))
      .select(lit(n).as("n"), lit(k).as("k"), lit(t).as("threshold"),
        col("m"),
        when(col("m") > 0, col("sum_micro").cast("double")
          / (lit(1e6) * col("m").cast("double"))).as("gamma"),
        when(col("m") > 0 && col("sum_micro") > 0,
          lit(1e6) * col("m").cast("double")
            / col("sum_micro").cast("double")).as("alpha"))
  }
}

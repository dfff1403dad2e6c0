package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split conformal prediction (Vovk et al.; Lei et al. JASA 2018) —
  * distribution-free, finite-sample-valid prediction intervals around
  * ANY point predictor: with calibration nonconformity scores
  * s_i = |y_i − ŷ_i| and q̂ = the ⌈(1−α)(n+1)⌉-th smallest score,
  * the interval ŷ ± q̂ covers a fresh point with probability ≥ 1−α —
  * no model or distribution assumptions, just exchangeability. The
  * uncertainty-quantification primitive a shipped regressor owes next
  * to the eval family's discrimination metrics (AUC/calibration): "how
  * wide must the error bar be for 95% coverage" answered exactly.
  *
  * The finite-sample (n+1) ceiling is the whole point (a naive (1−α)·n
  * quantile undercovers); when ⌈(1−α)(n+1)⌉ > n the guarantee needs
  * the infinite interval — reported as a null q̂ with coverage 1, not
  * an error.
  *
  * Determinism: scores are exact long distances (integer-ize the value
  * upstream — cents, micro); k is integer-ceiling arithmetic; q̂ is the
  * exact k-th order statistic via [[HistQuantile.exactKth]]'s range
  * narrowing (≤5 census passes, no global sort); test coverage is one
  * shuffle-free literal-filter scan. Driver traffic: exactKth's ≤2¹⁶
  * census rows per pass plus the one q̂ row.
  */
object Conformal {

  /** One row: (n_cal, k, qhat, n_test, covered, coverage) — q̂ at miss
    * level alphaMicro (α·1e6), coverage the exact test fraction inside
    * ±q̂. Null q̂ (k > n regime) covers everything by construction.
    */
  def splitConformal(cal: DataFrame, test: DataFrame, pred: Column,
                     actual: Column, alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    def scores(df: DataFrame) =
      df.select(abs(actual.cast("long") - pred.cast("long")).as("s"))
        .where(col("s").isNotNull)
    val calS = scores(cal)
    val n = calS.count()
    require(n >= 1, "calibration set is empty")
    val k = ((1000000L - alphaMicro) * (n + 1) + 999999L) / 1000000L
    val qhat: Option[Long] =
      if (k > n) None
      else Some(HistQuantile.exactKth(calS, col("s"), k).head().getLong(2))
    val inside = qhat match {
      case Some(q) => col("s") <= q
      case None => lit(true)
    }
    scores(test).agg(count(lit(1)).as("n_test"),
        sum(when(inside, 1L).otherwise(0L)).as("covered"))
      .select(lit(n).as("n_cal"), lit(k).as("k"),
        qhat.map(lit(_)).getOrElse(lit(null).cast("long")).as("qhat"),
        col("n_test"), col("covered"),
        (col("covered").cast("double") / col("n_test")).as("coverage"))
  }
}

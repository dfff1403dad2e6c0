package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forecast-baseline evaluation — MASE (mean absolute scaled error,
  * Hyndman & Koehler 2006) of the SEASONAL-NAIVE forecast over a
  * per-period count series: before anyone ships a traffic model, the
  * question is whether it beats "same hour yesterday", and MASE is the
  * scale-free way to say so (MASE < 1 ⇔ the candidate — here the
  * seasonal baseline itself — beats the one-step naive walk). The
  * monitoring use: a seasonal MASE that suddenly rises means the
  * series' weekly/daily structure broke — an ingestion regime change,
  * not noise. Beyond-reference surface (SURVEY §2.13).
  *
  * MASE = (Σ|y_t − y_{t−season}| / n_s) / (Σ|y_t − y_{t−1}| / n_1),
  * both sums over the pairs that EXIST (gaps in t simply contribute no
  * pair — no imputation). Counts are exact longs, both error masses
  * exact DECIMAL(38,0) sums, ONE double chain at the end rounded 6dp;
  * null when either pair set is empty or the naive error mass is 0.
  *
  * Shapes: the lag structure is two EQUI-JOINS on t − k (not a global
  * window — a single unpartitioned series window would serialize; the
  * join shuffles on t and scales with the series census). Output one
  * row: (n, n_seasonal, n_naive, mase).
  */
object Forecast {

  /** `series`: (t, y) integer periods and counts, one row per present
    * period.
    */
  def seasonalNaiveEval(series: DataFrame, season: Long): DataFrame = {
    require(season >= 2, s"season must be >= 2 (1 is the naive walk), got $season")
    val s = series.select(col("t").cast("long").as("t"),
      col("y").cast("long").as("y"))
    def lagErr(k: Long) = s.as("a")
      .join(s.as("b"), col("a.t") === col("b.t") + k)
      .select(abs(col("a.y") - col("b.y")).cast("decimal(38,0)").as("e"))
      .agg(count(lit(1)).as("n"), sum(col("e")).as("s"))
    val se = lagErr(season).select(col("n").as("n_seasonal"), col("s").as("ss"))
    val ne = lagErr(1L).select(col("n").as("n_naive"), col("s").as("sn"))
    s.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(se)).crossJoin(broadcast(ne))
      .select(col("n"), col("n_seasonal"), col("n_naive"),
        when(col("n_seasonal") > 0 && col("n_naive") > 0 && col("sn") > 0,
          round((col("ss").cast("double") / col("n_seasonal"))
            / (col("sn").cast("double") / col("n_naive")), 6)).as("mase"))
  }
}

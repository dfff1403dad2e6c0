package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal-naive anomaly detection — flag buckets whose value moved
  * more than k MADs from the SAME BUCKET ONE SEASON AGO: the
  * weekly-rhythm-aware alert ("Monday vs last Monday") that a plain
  * moving-average band ([[Smoothing]]) false-alarms on every weekend
  * and [[EventAnalytics]]'s rate anomaly ignores. Residual r(t) =
  * x(t) − x(t−period); center = median(r), scale = MAD(r) per series —
  * both ROBUST order statistics, so one genuine outage in the history
  * doesn't widen the band that should catch the next one (the classic
  * failure of mean ± k·σ).
  *
  * Exactness: integer values, exact residuals from one shifted-bucket
  * equi-join (the first `period` buckets have no seasonal twin and are
  * excluded — the honest warm-up), LOWER medians by rank ((n+1) div 2
  * over (value, bucket) — a total order), and the verdict is the
  * integer cross-multiplication &#124;r − med&#124;·1e6 > k_micro·MAD — never a
  * float threshold.
  *
  * Scale shape: one (group × bucket) census shuffle, one self-join on
  * the shifted bucket, then two rank windows AT CENSUS GRAIN (series
  * lengths are calendar-bounded). No driver data path.
  */
object SeasonalAnomaly {

  /** (key, bucket, v, v_lag, r, med, mad, anomaly) for every bucket
    * with a seasonal twin; `kMicro` = k·1e6 MAD half-width.
    */
  def detect(df: DataFrame, group: Column, bucket: Column, value: Column,
             period: Int, kMicro: Long): DataFrame = {
    require(period >= 1, s"period must be >= 1, got $period")
    require(kMicro >= 0, s"kMicro must be >= 0, got $kMicro")
    val census = df.groupBy(group.cast("string").as("key"),
        bucket.cast("long").as("b"))
      .agg(sum(value.cast("long")).as("v"))
    val lagged = census.select(col("key"), (col("b") + period).as("b"),
      col("v").as("v_lag"))
    val resid = census.join(lagged, Seq("key", "b"))
      .withColumn("r", col("v") - col("v_lag"))
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy("key").orderBy(col(c).asc, col("b").asc)
      val n = Window.partitionBy("key")
      in.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(n))
        .withColumn(out,
          max(when(col("_rn") === expr("(_n + 1) div 2"), col(c))).over(n))
        .drop("_rn", "_n")
    }
    val withMed = lowerMedian(resid, "r", "med")
      .withColumn("dev", abs(col("r") - col("med")))
    lowerMedian(withMed, "dev", "mad")
      .withColumn("anomaly",
        col("dev") * lit(1000000L) > lit(kMicro) * col("mad"))
      .select("key", "b", "v", "v_lag", "r", "med", "mad", "anomaly")
  }
}

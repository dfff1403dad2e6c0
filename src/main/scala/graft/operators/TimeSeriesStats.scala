package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Census-grain time-series statistics next to [[Changepoint]]: a
  * robust trend (Theil–Sen) and exact sample autocorrelations — the
  * monitoring questions after "did the level shift?": "is there a
  * trend, robust to spikes?" and "is there seasonality?". Both run on a
  * (bucket, cnt) census, so everything downstream of the one
  * partial-agg shuffle is bounded by the bucket count, never rows.
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Determinism: Theil–Sen slopes are single IEEE divisions of exact
  * long deltas (identical across engines), ordered with (i, j)
  * tie-breaks; ACF is assembled from exact integer power sums — the
  * full formula is multiplied through by n² so every term is a long,
  * and exactly ONE double division produces each r_k. Long headroom:
  * n²·Σxy stays below 2⁶³ for bucket counts ≤ ~10⁴ with values ≤ ~10⁶
  * (census grain by construction; pre-scale counts beyond that).
  */
object TimeSeriesStats {

  /** Theil–Sen estimator over a (bucket, cnt) census: the MEDIAN of all
    * pairwise slopes (cnt_j−cnt_i)/(bucket_j−bucket_i), i<j — a trend
    * robust to up to ~29% outliers, where least squares follows every
    * spike. Median = the ceil(m/2) order statistic with (i, j)
    * tie-break. Output one row: (n_pairs, slope, intercept) with
    * intercept the median of cnt − slope·bucket (the standard
    * completion). Pairs are census² — fine at census grain.
    */
  def theilSen(censusDf: DataFrame): DataFrame = {
    val a = censusDf.select(col("bucket").as("bi"), col("cnt").as("ci"))
    val b = censusDf.select(col("bucket").as("bj"), col("cnt").as("cj"))
    val slopes = a.crossJoin(b).where(col("bj") > col("bi"))
      .select(col("bi"), col("bj"),
        ((col("cj") - col("ci")).cast("double") /
          (col("bj") - col("bi"))).as("slope"))
    val m = slopes
      .withColumn("_r", row_number().over(
        Window.orderBy(col("slope").asc, col("bi").asc, col("bj").asc))
        .cast("long"))
      .withColumn("_n", count(lit(1)).over(
        Window.orderBy(col("slope"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("_r") === ceil(col("_n").cast("double") / 2).cast("long"))
      .select(col("_n").as("n_pairs"), col("slope"))
    val s = m.head()
    val (nPairs, slope) = (s.getLong(0), s.getDouble(1))
    val ic = censusDf
      .select((col("cnt").cast("double") - lit(slope) * col("bucket"))
        .as("res"))
      .withColumn("_r", row_number().over(
        Window.orderBy(col("res").asc)).cast("long"))
      .withColumn("_n", count(lit(1)).over(
        Window.orderBy(col("res"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("_r") === ceil(col("_n").cast("double") / 2).cast("long"))
      .select(lit(nPairs).as("n_pairs"), round(lit(slope), 6).as("slope"),
        round(col("res"), 6).as("intercept"))
    ic
  }

  /** Sample autocorrelation r_k for k = 1..maxLag over a CONTIGUOUS
    * integer-bucket census (missing buckets are genuinely absent
    * periods — fill upstream if zero-fill semantics are wanted):
    * r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², assembled from exact
    * integer sums scaled by n² (see object doc), one double division
    * per lag. Output: (lag, n_terms, r) per lag.
    */
  def autocorrelation(censusDf: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = censusDf.select(col("bucket"), col("cnt")).localCheckpoint()
    val tot = base.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
      sum(col("cnt") * col("cnt")).as("sq"))
    val lags = (1 to maxLag).map { k =>
      val shifted = base.select((col("bucket") - k).as("bucket"),
        col("cnt").as("cnt_k"))
      base.join(shifted, Seq("bucket"))
        .agg(count(lit(1)).as("m"), sum(col("cnt") * col("cnt_k")).as("sxy"),
          sum(col("cnt")).as("sh"), sum(col("cnt_k")).as("st"))
        .crossJoin(broadcast(tot))
        .select(lit(k.toLong).as("lag"), col("m").as("n_terms"),
          // n²·num = n²Σxy − nS(Σh+Σt) + m·S²; n²·den = n²Σx² − nS²
          round(
            (col("n") * col("n") * col("sxy")
              - col("n") * col("s") * (col("sh") + col("st"))
              + col("m") * col("s") * col("s")).cast("double") /
              (col("n") * col("n") * col("sq") - col("n") * col("s") * col("s")),
            6).as("r"))
    }
    lags.reduce(_ unionByName _)
  }
}

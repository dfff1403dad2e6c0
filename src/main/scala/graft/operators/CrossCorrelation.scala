package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-correlation lead–lag detection — WHICH SHIFT best aligns a
  * metric with a reference: dot(L) = Σ_t x(t)·y(t−L) over the shared
  * bucket grid, maximized over L ∈ [−maxLag, maxLag]. The
  * "errors follow deploys by two hours" / "signups lead purchases by a
  * day" primitive: [[Dtw]] scores elastic similarity but doesn't name
  * a single lag; [[Forecast]]'s ACF is a series against ITSELF — this
  * is the cross-series version that turns two dashboards into a causal
  * lead hint. best lag > 0 means the group FOLLOWS the reference.
  *
  * Exactness: integer series (counts/cents) make every product and sum
  * exact longs; the winner is picked by the total order (dot desc,
  * &#124;lag&#124; asc, lag asc) — prefer the smallest shift on ties, so the
  * verdict is deterministic.
  *
  * Scale shape: two (·, bucket) censuses, the lag grid (2·maxLag+1
  * rows) broadcast-crossed against the GROUP census (not the corpus),
  * one equi-join on the shifted bucket, one pair-grain partial agg,
  * and a (2·maxLag+1)-row-per-group census window for the argmax. No
  * corpus-sized window, no driver data path.
  */
object CrossCorrelation {

  /** (key, lag, n_overlap, dot, is_best) for every lag in
    * [−maxLag, maxLag]; is_best marks each group's aligned shift.
    * Lags with no overlapping buckets keep (0, 0) — a zero series
    * overlap is information, not absence.
    */
  def bestLag(df: DataFrame, group: Column, bucket: Column, value: Column,
              ref: DataFrame, refBucket: Column, refValue: Column,
              maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val spark = df.sparkSession
    import spark.implicits._
    val gx = df.groupBy(group.cast("string").as("key"),
        bucket.cast("long").as("b"))
      .agg(sum(value.cast("long")).as("x"))
    val ry = ref.groupBy(refBucket.cast("long").as("rb"))
      .agg(sum(refValue.cast("long")).as("y"))
    val lags = broadcast((-maxLag to maxLag).map(_.toLong).toDF("lag"))
    val scored = gx.crossJoin(lags)
      .join(ry, col("rb") === col("b") - col("lag"))
      .groupBy("key", "lag")
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("x") * col("y")).as("dot"))
    // densify: every (key, lag) appears even with zero overlap
    val dense = gx.select("key").distinct().crossJoin(lags)
      .join(scored, Seq("key", "lag"), "left_outer")
      .na.fill(0L, Seq("n_overlap", "dot"))
    val w = Window.partitionBy("key")
      .orderBy(col("dot").desc, abs(col("lag")).asc, col("lag").asc)
    dense.withColumn("is_best", row_number().over(w) === 1)
  }
}

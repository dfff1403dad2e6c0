package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pinball (quantile) loss — THE proper scoring rule for quantile
  * forecasts: L_τ(y, ŷ) = max(τ·(y−ŷ), (τ−1)·(y−ŷ)), minimized in
  * expectation exactly when ŷ is the τ-quantile, so it scores a P90
  * capacity forecast or a P10 safety floor the way a squared error
  * scores a mean. Completes the forecast-eval family next to
  * [[Forecast]]'s MASE (point forecasts) and [[Conformal]]'s coverage
  * (interval validity): coverage says an interval is honest, pinball
  * says WHICH quantile forecaster is sharper.
  *
  * Exactness: integer y/ŷ (cents, micro) and micro τ make every term
  * max(τµ·d, (τµ−1e6)·d) an exact long; the sum is exact and the mean
  * is one integer-ratio division. Per (group × τ) output so one call
  * scores a whole quantile ladder.
  *
  * Scale shape: the τ ladder (broadcast literal rows) crossed with the
  * data ONE partial-aggregable shuffle to (group × τ) grain. No
  * windows, no driver data path.
  */
object Pinball {

  /** (key, tau_micro, n, loss_sum_micro, loss): mean pinball loss of
    * `yhat` against `y` per group and τ; y/ŷ integer-valued upstream.
    */
  def loss(df: DataFrame, group: Column, y: Column, yhat: Column,
           tausMicro: Seq[Long]): DataFrame = {
    require(tausMicro.nonEmpty, "at least one tau required")
    tausMicro.foreach(t => require(t > 0 && t < 1000000L,
      s"tau_micro must be in (0, 1e6), got $t"))
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(group.cast("string").as("key"),
      (y.cast("long") - yhat.cast("long")).as("d"))
    base.crossJoin(broadcast(tausMicro.toDF("tau_micro")))
      .select(col("key"), col("tau_micro"),
        greatest(col("tau_micro") * col("d"),
          (col("tau_micro") - lit(1000000L)) * col("d")).as("term"))
      .groupBy("key", "tau_micro")
      // DECIMAL through the sum (terms are τµ-scaled — a long sum can
      // overflow at corpus scale), back to long once reduced
      .agg(count(lit(1)).as("n"),
        sum(col("term").cast("decimal(38,0)")).cast("long")
          .as("loss_sum_micro"))
      .withColumn("loss",
        col("loss_sum_micro").cast("double")
          / (lit(1e6) * col("n").cast("double")))
  }
}

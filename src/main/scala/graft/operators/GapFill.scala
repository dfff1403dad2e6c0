package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification — the prep step every forecasting /
  * anomaly operator in this engine silently assumes: a DENSE per-key
  * hourly grid between each key's first and last event, with zero
  * counts on quiet hours and the last observed value CARRIED FORWARD
  * (a gauge reading persists; its absence is not zero). Sparse bucket
  * censuses straight out of groupBy make lag/EWMA/changepoint math
  * skip over gaps as if they were adjacent hours. Beyond-reference
  * surface (SURVEY §2.13).
  *
  * Exactness: hour = ts_us − (ts_us mod 3600e6) (non-negative µs, so
  * floor ≡ truncate on both engines); each hour's representative value
  * is the LAST event's by the (ts_us, event_id) total order (max of a
  * struct — deterministic under duplicate timestamps); values are
  * micro-quantized before anything sums or carries. The carry is a
  * per-key ordered `last(ignoreNulls)` running window the oracle
  * replays as `last_value(x IGNORE NULLS)`.
  *
  * 100 TB shape: one (key, hour) partial-agg shuffle, one bounds
  * census, the grid explode is output-proportional (span hours per
  * key), and the carry window partitions by KEY — bounded by a key's
  * activity span, never global. Keys with multi-year spans at minute
  * grain should pre-split the range (the documented contract of every
  * per-key ordered window in this engine).
  */
object GapFill {

  private val HourUs = 3600000000L

  /** Dense (user_id, hour_us) grid over `events` (user_id, ts,
    * event_id, value): n_events (0 on gaps) and v_cf_micro — the
    * carried-forward last observed micro value (null before a key's
    * first observation-bearing hour; the grid starts AT the first
    * event, so only possible when the first hour's value is itself
    * null — it is not here, values coalesce to 0).
    */
  def hourlyDense(events: DataFrame): DataFrame = {
    val ev = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("event_id"),
        round(coalesce(col("value"), lit(0.0)) * 1e6).cast("long").as("vmicro"))
      .withColumn("hour_us", col("ts_us") - pmod(col("ts_us"), lit(HourUs)))
    val perHour = ev.groupBy("user_id", "hour_us")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts_us"), col("event_id"), col("vmicro")))
          .getField("vmicro").as("v_last"))
    val grid = ev.groupBy("user_id")
      .agg(min(col("hour_us")).as("h0"), max(col("hour_us")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), lit(HourUs))).as("hour_us"))
    val carry = Window.partitionBy("user_id").orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perHour, Seq("user_id", "hour_us"), "left_outer")
      .select(col("user_id"), col("hour_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v_last"), ignoreNulls = true).over(carry).as("v_cf_micro"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gap-based session assignment over an event
  * log, the offline twin of the streaming session windows in
  * [[graft.streaming.EventStream.sessionCounts]] (the streaming path
  * keeps watermark-bounded state; this path is the replayable batch
  * recomputation over history). Beyond-reference surface (SURVEY §2.13).
  *
  * A session breaks when the gap to the previous event of the same user
  * exceeds `gapUs`; session ids are then the running count of breaks —
  * one pass with two windows over the SAME (user, time) partition
  * order, so Spark plans a single sort per user partition, no
  * self-join. All arithmetic is integer µs; ties on ts break by
  * event_id, making the assignment total and engine-replayable.
  *
  * 100 TB shape: one shuffle on user_id (the window partition key);
  * within-partition sort by (ts, event_id). Skewed power users are
  * bounded by their own history length — for adversarial single-user
  * logs, pre-split by (user, day) and stitch session ids at day
  * boundaries (the standard warehouse recipe; documented, not
  * implemented — the generic path must not pay the stitch).
  */
object Sessionize {

  /** (event_id, user_id, ts_us, session_id, session_seq): session_id is
    * 0-based per user, session_seq 1-based within the session.
    */
  def assign(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("_brk",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id", sum(col("_brk")).over(byUser))
      .withColumn("session_seq",
        row_number().over(Window.partitionBy("user_id", "session_id")
          .orderBy(col("ts_us"), col("event_id"))))
      .select("event_id", "user_id", "ts_us", "session_id", "session_seq")
  }

  /** Per-session rollup: bounds, event count, duration. */
  def sessions(events: DataFrame, gapUs: Long = 1800000000L): DataFrame =
    assign(events, gapUs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-user distinct-type census on arbitrary-state v2 MAPSTATE — the
  * third leg of the transformWithState surface next to
  * [[StatefulSessions]]'s ValueState + timers: an incrementally
  * maintained (type → count) map per user, so each trigger emits the
  * user's EXACT lifetime distinct-type count and event total without
  * re-scanning history (the running "how diverse is this user/source"
  * card of ingestion monitoring). Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Emission: one row per key per trigger THAT SAW the key (append
  * mode) — an update stream; downstream keeps the latest row per user.
  * The batch analog (TimeMode.None, one "trigger") therefore emits the
  * exact full-corpus census, which is what the `st_type_census` oracle
  * replays as plain COUNT(DISTINCT)/COUNT.
  *
  * 100 TB shape: state is one RocksDB map per ACTIVE user, bounded by
  * that user's distinct-type vocabulary (not history length); per
  * trigger the map grows by at most the batch's novel types and the
  * census fold iterates only this user's map. One keyed shuffle.
  */
object TypeCensus {

  case class TypeCount(user_id: Long, n_types: Long, n_events: Long)

  class TypeCensusProcessor
      extends StatefulProcessor[Long, (Long, String), TypeCount] {

    @transient private var seen: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Long]("seen",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, String)],
                                 tv: TimerValues): Iterator[TypeCount] = {
      rows.foreach { case (_, t) =>
        val prev = if (seen.containsKey(t)) seen.getValue(t) else 0L
        seen.updateValue(t, prev + 1L)
      }
      var types = 0L; var events = 0L
      seen.values().foreach { c => types += 1; events += c }
      Iterator.single(TypeCount(uid, types, events))
    }
  }

  /** Census stream over `events` (user_id, event_type). Batch input
    * emits the exact full-corpus census in one pass.
    */
  def typeCensus(events: DataFrame): Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    if (!spark.conf.getOption(pk).contains(rocks)) spark.conf.set(pk, rocks)
    org.apache.spark.sql.GraftBridge.ensureStateStoreCoordinator(spark)
    events.select(col("user_id").cast("long").as("user_id"),
        coalesce(col("event_type"), lit("")).as("event_type"))
      .where(col("user_id").isNotNull)
      .as[(Long, String)]
      .groupByKey(_._1)
      // the census registers no timers, so TimeMode.None in BOTH modes.
      // NOT ProcessingTime: shouldRunAnotherBatch is unconditionally
      // true in that mode (Spark 4.1.2, TransformWithStateExecBase), so
      // an AvailableNow query would never terminate — the root cause
      // behind the round-7 "stopped-RpcEnv" note; see RecentItems'
      // scaladoc and ProcessingTimeTwsSpec for the full account.
      .transformWithState(new TypeCensusProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}

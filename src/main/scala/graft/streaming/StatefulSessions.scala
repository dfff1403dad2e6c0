package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Gap sessionization on the Spark 4 arbitrary-state v2 API
  * (`transformWithState` + event-time TIMERS) — the stateful surface
  * the older `flatMapGroupsWithState` gates
  * ([[EventStream.sequencedEvents]], [[EventStream.ewmaStream]])
  * cannot express: a session that simply STOPS (no further events
  * ever) still gets emitted, because the registered event-time timer
  * fires when the watermark passes `last + gap` — no poison-pill event
  * or query teardown needed. Beyond-reference surface (SURVEY §2.13).
  *
  * Semantics: per user, events ≤ `gap` apart join one session; a
  * closed session emits (start, end, n_events, Σ round(value·1e6)) —
  * the value sum micro-quantized per event BEFORE summing so the
  * emission is exact integer arithmetic regardless of fold order.
  * Within a micro-batch, rows fold in (ts, event_id) order; across
  * batches the fold continues from the carried state, with min/max
  * guards so a within-gap straggler extends rather than corrupts the
  * session.
  *
  * Execution modes:
  *  - STREAMING: TimeMode.EventTime; each batch re-arms one timer at
  *    `last + gap` (the previous one is deleted — a stale timer that
  *    still fires is ignored by comparing against the armed timestamp
  *    carried in state). Closed-by-gap sessions emit with the batch;
  *    the final session of a quiet user emits on timer expiry.
  *  - BATCH (the oracle gate's analog): TimeMode.None — timers cannot
  *    fire, so each user's LAST session intentionally stays unemitted
  *    (it is not closed: more data could extend it). The DuckDB oracle
  *    mirrors exactly that contract.
  *
  * 100 TB shape: state is ONE fixed-width row per ACTIVE user (not
  * per event — contrast session_window aggregation, which buffers
  * events until the watermark closes the window), keyed-shuffled once;
  * RocksDB-backed in streaming, so the active-user set can exceed
  * memory; emission is append-mode and watermark-bounded.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long,
                          value_micro: Long)
  case class SessionAgg(start_us: Long, last_us: Long, n: Long,
                        sum_micro: Long, timer_ms: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, sum_value_micro: Long)

  class SessionProcessor(gapUs: Long, timers: Boolean)
      extends StatefulProcessor[Long, SessionEvent, SessionOut] {

    @transient private var st: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionAgg]("session",
        Encoders.product[SessionAgg], TTLConfig.NONE)

    private def close(uid: Long, s: SessionAgg): SessionOut =
      SessionOut(uid, s.start_us, s.last_us, s.n, s.sum_micro)

    override def handleInputRows(uid: Long, rows: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      val armed = if (st.exists()) st.get().timer_ms else 0L
      var cur: Option[SessionAgg] = if (st.exists()) Some(st.get()) else None
      for (e <- sorted) {
        cur = cur match {
          case Some(s) if e.ts_us - s.last_us > gapUs =>
            out += close(uid, s)
            Some(SessionAgg(e.ts_us, e.ts_us, 1, e.value_micro, 0))
          case Some(s) =>
            Some(SessionAgg(math.min(s.start_us, e.ts_us),
              math.max(s.last_us, e.ts_us), s.n + 1,
              s.sum_micro + e.value_micro, s.timer_ms))
          case None =>
            Some(SessionAgg(e.ts_us, e.ts_us, 1, e.value_micro, 0))
        }
      }
      var next = cur.get
      if (timers) {
        if (armed > 0) getHandle.deleteTimer(armed)
        val at = (next.last_us + gapUs) / 1000L + 1L
        getHandle.registerTimer(at)
        next = next.copy(timer_ms = at)
      }
      st.update(next)
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      // a stale timer (deleted-then-raced or re-armed) must not close a
      // live session: only the armed timestamp carried in state counts
      if (info.getExpiryTimeInMs() != s.timer_ms) return Iterator.empty
      st.clear()
      Iterator.single(close(uid, s))
    }
  }

  /** Session summaries over `events` (needs user_id, ts, event_id,
    * value). Streaming input must be watermarked by the caller (the
    * watermark drives timer expiry); batch input runs TimeMode.None —
    * see the class doc for the open-session contract.
    */
  def sessionSummaries(events: DataFrame, gapMinutes: Long = 30): Dataset[SessionOut] = {
    require(gapMinutes >= 1, s"gap must be >= 1 minute, got $gapMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    // arbitrary-state v2 runs ONLY on the RocksDB store (multiple column
    // families); the default HDFS-backed provider fails at state load.
    // RocksDB is the production-recommended store anyway, so pin it here
    // rather than fail — a session that already chose it is untouched.
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    if (!spark.conf.getOption(pk).contains(rocks)) spark.conf.set(pk, rocks)
    // BATCH execution still loads a state store, whose executor side
    // resolves the driver's StateStoreCoordinator RPC endpoint — created
    // only when the streaming query manager materializes it. Force it
    // here or a pure-batch session fails with RpcEndpointNotFoundException.
    org.apache.spark.sql.GraftBridge.ensureStateStoreCoordinator(spark)
    val gapUs = gapMinutes * 60L * 1000000L
    val streaming = events.isStreaming
    events.select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("event_id"),
        round(coalesce(col("value"), lit(0.0)) * 1e6).cast("long")
          .as("value_micro"))
      .where(col("user_id").isNotNull && col("ts_us").isNotNull)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs, streaming),
        if (streaming) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append())
  }
}

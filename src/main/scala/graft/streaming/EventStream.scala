package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Every transform here is batch/stream agnostic: watermarks apply only
  * when the input is streaming, so the same logical query runs in the
  * batch gate (DuckDB-checkable) and incrementally via readStream.
  * The reference pipeline is batch-only (SURVEY §2.12) — this module is
  * part of the engine's beyond-reference surface.
  */
object EventStream {

  /** The events table's raw on-disk shape when ts is TIMESTAMP(NANOS):
    * int64, readable by Spark only as long under
    * spark.sql.legacy.parquet.nanosAsLong=true. The schema-inference
    * fallback for empty source directories.
    */
  val eventSchemaRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** FileStreamSource needs an explicit schema; rather than hard-coding
    * one, peek at the batch-resolved schema of the same directory so both
    * on-disk shapes of the events table work: TIMESTAMP(NANOS) stored as
    * int64 (readable only as long under
    * spark.sql.legacy.parquet.nanosAsLong=true — normalized to a µs
    * timestamp here, mirroring [[graft.Tables.events]]) and native
    * TIMESTAMP(MICROS)/INT96 (passed through untouched). A stream started
    * against a not-yet-populated directory (the usual streaming deploy
    * order: consumer first, producer second) has nothing to peek at —
    * fall back to [[eventSchemaRaw]] instead of failing schema inference.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => eventSchemaRaw }
    val s = spark.readStream.schema(batchSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    if (batchSchema("ts").dataType == LongType)
      s.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else s
  }

  private def watermarked(events: DataFrame, watermark: String): DataFrame =
    if (events.isStreaming) events.withWatermark("ts", watermark) else events

  /** Tumbling-window counts per event type. Window bounds are emitted as
    * formatted strings so batch results hash identically across engines
    * (timestamp precision differs: ns in parquet, µs in Spark).
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame = {
    // streaming aggregation forbids exact distinct → HLL++ there (exact at
    // the per-window cardinalities involved), exact count in batch so the
    // oracle comparison stays strict.
    val users =
      if (events.isStreaming) approx_count_distinct(col("user_id"))
      else count_distinct(col("user_id"))
    watermarked(events, watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        users.as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("n_users"), col("min_value"), col("max_value"))
  }

  /** Per-window top-k "talkers" (highest-volume users) — the rate-limit
    * / abuse dashboard staple: hourly (window × user) counts, then the
    * k heaviest users per window THROUGH THE CUSTOM HEAP OPERATOR
    * ([[graft.operators.TopK.groupedTopK]] — partial heaps k-bound the
    * shuffle, no sort, no window exec), total order (n desc, user_id
    * asc). Batch and streaming run the same aggregation; the streaming
    * composition puts the rank stage in `foreachBatch` (a top-k after a
    * streaming agg can't chain inside one query — ranking is not an
    * incremental operator; pinned in `StreamingSpec`).
    * Output: (window_start, user_id, n).
    */
  def topTalkers(events: DataFrame, k: Int = 3,
                 windowLength: String = "1 hour",
                 watermark: String = "10 minutes"): DataFrame =
    rankTalkers(
      watermarked(events, watermark)
        .groupBy(window(col("ts"), windowLength).as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("user_id"), col("n")), k)

  /** The rank stage of [[topTalkers]] — applied post-aggregation (in
    * `foreachBatch` on the streaming side).
    */
  def rankTalkers(counts: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.groupedTopK(counts, Seq("window_start"),
      Seq(("n", false), ("user_id", true)), k)

  /** Streaming drift monitoring, census half: the per-event-time-window
    * equi-width value histogram — ONE stateful aggregation whose state
    * is (windows × buckets) rows, never events. The PSI itself is
    * census-grain post-processing ([[psiOfWindows]]) a consumer runs on
    * the append output (or in foreachBatch): splitting census from
    * score keeps the streaming state bounded and the scoring formula
    * batch-replayable. Bucket formula = [[graft.operators.HistQuantile
    * .histogram]]'s (clamped edges, null values dropped).
    */
  def windowedHistogram(events: DataFrame, lo: Double, hi: Double,
                        buckets: Int, windowLength: String = "1 hour",
                        watermark: String = "10 minutes"): DataFrame = {
    require(buckets > 0 && hi > lo, s"bad histogram [$lo, $hi) × $buckets")
    val w = (hi - lo) / buckets
    val b = least(greatest(floor((col("value") - lit(lo)) / lit(w)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("bigint")
    watermarked(events, watermark)
      .where(col("value").isNotNull)
      .groupBy(window(col("ts"), windowLength).as("w"), b.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("bucket"), col("cnt"))
  }

  /** PSI per window from a [[windowedHistogram]] census against a static
    * baseline census (bucket, n_expected): every window sees every
    * baseline bucket (windows × buckets generate, zero-filled), each
    * bucket contributes the micro-rounded (p−q)·ln(p/q) term
    * ([[graft.operators.Drift]]'s 0.5 pseudo-count contract), and the
    * per-window sum is exact long arithmetic. Output: (window_start_us,
    * psi) — alert when psi > 0.25.
    */
  def psiOfWindows(census: DataFrame, baseline: DataFrame): DataFrame = {
    val spark = census.sparkSession
    import spark.implicits._
    val base = baseline.select(col("bucket"), col("n_expected"))
    val ne = base.agg(sum(col("n_expected")).as("ne"))
    // bucket domain = baseline ∪ observed (either side may be sparse —
    // mass where the other side has none is exactly what PSI must see).
    // Rebuilt as a fresh ≤|buckets|-row frame (offset-table rule), and
    // every census reference below is explicitly aliased — the census
    // appears three times (windows, counts, totals) and unaliased
    // self-joins trip Catalyst's conflicting-reference check.
    val bdom = base.select("bucket").union(census.select("bucket"))
      .distinct().collect().map(_.getLong(0)).toSeq.toDF("bucket")
    val windows = census.select(col("window_start_us")).distinct()
      .alias("win")
    val cen = census.alias("cen")
    val na = census.groupBy("window_start_us").agg(sum(col("cnt")).as("na"))
      .alias("na")
    val grid = windows.crossJoin(broadcast(bdom.alias("bd")))
      .join(broadcast(base.alias("b")),
        col("bd.bucket") === col("b.bucket"), "left_outer")
      .select(col("win.window_start_us").as("ws"),
        col("bd.bucket").as("bkt"),
        coalesce(col("b.n_expected"), lit(0L)).as("n_exp"))
      .join(cen,
        col("ws") === col("cen.window_start_us") &&
          col("bkt") === col("cen.bucket"), "left_outer")
      .select(col("ws"), col("bkt"), col("n_exp"),
        coalesce(col("cen.cnt"), lit(0L)).as("n_act"))
    val p = greatest(col("n_exp").cast("double"), lit(0.5)) / col("ne")
    val q = greatest(col("n_act").cast("double"), lit(0.5)) / col("na")
    grid.join(na, col("ws") === col("na.window_start_us"))
      .crossJoin(broadcast(ne))
      .withColumn("term_micro",
        round((p - q) * log(p / q) * 1e6).cast("long"))
      .groupBy(col("ws").as("window_start_us"))
      .agg(round(sum(col("term_micro")).cast("double") / 1e6, 6).as("psi"))
  }

  /** Per-user session windows (gap-based). Emits count + span rather than
    * the raw window struct for cross-engine comparability.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    watermarked(events, watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** Exact-id dedup, batch/stream agnostic: streaming uses
    * dropDuplicatesWithinWatermark so the dedup state is bounded by the
    * watermark horizon (an unbounded dropDuplicates would grow state
    * forever at 100 TB-stream scale); batch is a plain dropDuplicates.
    * With a unique id per logical event both pick the same survivors.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(Seq("event_id"))
    else events.dropDuplicates(Seq("event_id"))

  /** Stream-static enrichment: join the (unbounded) event stream against a
    * bounded dimension frame. The dim side is broadcast — each micro-batch
    * (or batch partition) probes a local hash map; no stream-side shuffle.
    * `dim` must carry `user_id` plus the enrichment columns.
    */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left_outer")

  /** CHAINED time-window aggregation — two stateful operators in ONE
    * streaming query (Spark 3.4+ multiple-stateful-operator support):
    * hourly per-type counts roll up into daily totals + active-hour
    * counts via `window(window_time(w), "1 day")`. The pre-3.4 shape
    * was two queries with an intermediate sink; the chained form keeps
    * the hourly grain entirely inside the state store — the standard
    * coarse-rollup-over-fine-windows dashboard query. Batch/stream
    * agnostic like every transform here (window_time works on both).
    */
  def dailyRollup(events: DataFrame,
                  watermark: String = "10 minutes"): DataFrame =
    watermarked(events, watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("w")), "1 day").as("d"),
        col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_active_hours"))
      .select(date_format(col("d.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("n_active_hours"))

  case class UserRunningCount(userId: Long, events: Long, lastType: String)

  /** Custom streaming state: running per-user event counts via
    * mapGroupsWithState (KeyValueGroupedDataset) — the engine's
    * arbitrary-stateful-processing surface.
    */
  def runningUserCounts(events: DataFrame): Dataset[UserRunningCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    // (ts, event_id) sort inside the group: the iterator arrives in
    // shuffle order, so "last" is otherwise nondeterministic
    events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("_ts"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunningCount, UserRunningCount](
        GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunningCount]) =>
          val prev = state.getOption.getOrElse(UserRunningCount(uid, 0L, ""))
          val batch = rows.toIndexedSeq.sortBy(r => (r._3, r._4))
          val last = if (batch.isEmpty) prev.lastType else batch.last._2
          val next = UserRunningCount(uid, prev.events + batch.size, last)
          state.update(next)
          next
      }
  }

  case class EventSeq(user_id: Long, event_id: Long, seq: Long)

  /** Per-user lifetime sequence numbers via flatMapGroupsWithState — the
    * multi-row-output stateful surface (mapGroupsWithState emits exactly
    * one row per group per trigger; this emits one per event). State is a
    * single counter per user; each trigger sorts only its own micro-batch
    * slice by (ts, event_id) and continues numbering from the counter.
    */
  def sequencedEvents(events: DataFrame): Dataset[EventSeq] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us")).as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, EventSeq](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Long]) =>
          val start = state.getOption.getOrElse(0L)
          val sorted = rows.toIndexedSeq.sortBy(r => (r._3, r._2))
          val out = sorted.iterator.zipWithIndex.map {
            case ((_, eid, _), i) => EventSeq(uid, eid, start + i + 1)
          }.toIndexedSeq
          state.update(start + sorted.size)
          out.iterator
      }
  }

  case class EventEwma(user_id: Long, event_id: Long, ts_us: Long,
                       value_micro: Long, ewma_micro: Long)

  /** Streaming twin of [[graft.operators.Smoothing.ewma]]: the same
    * integer-exact recurrence s_t = (α·x_t + (1e6−α)·s_{t−1}) div 1e6,
    * run incrementally — state is ONE long per user (the last smoothed
    * value), each trigger sorts only its own micro-batch slice by
    * (ts_us, event_id) and folds on from the carried state. This is the
    * unbounded-history path the batch operator's scaladoc points to:
    * state never grows with history, only with the key count. Late data
    * past a processed slice would mis-order the recurrence — pair with
    * watermarked ingestion dedup upstream ([[dedupedEvents]]) when the
    * source can reorder beyond a micro-batch.
    */
  def ewmaStream(events: DataFrame, alphaMicro: Long): Dataset[EventEwma] = {
    require(alphaMicro > 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    val spark = events.sparkSession
    import spark.implicits._
    val a = alphaMicro
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 1e6).cast("long").as("x"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, EventEwma](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Long]) =>
          val sorted = rows.toIndexedSeq.sortBy(r => (r._3, r._2))
          // Option state, not a -1 sentinel: a sentinel would treat any
          // legitimately negative smoothed value as "no state" and
          // silently reset the recurrence every step. Negative inputs
          // are rejected outright — the div-vs-floor portability
          // contract (see Smoothing.ewma) only holds on non-negatives.
          var prev: Option[Long] = state.getOption
          val out = sorted.map { case (_, eid, ts, x) =>
            require(x >= 0,
              s"ewmaStream requires non-negative values, got micro=$x (user $uid)")
            val next = prev match {
              case None => x
              case Some(p) => (a * x + (1000000L - a) * p) / 1000000L
            }
            prev = Some(next)
            EventEwma(uid, eid, ts, x, next)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Stream-STREAM interval join (click attribution): each click joins
    * the same user's views from the preceding `window`. Both sides are
    * watermarked, and the range predicate is what lets Spark BOUND the
    * join state — an unconstrained stream-stream equi-join must buffer
    * both streams forever; with the interval bound, a buffered view ages
    * out of state once the click-side watermark passes view_ts + window.
    * Batch mode runs the identical join predicate, so the oracle replays
    * it. The time gap is emitted as integer microseconds (not raw
    * timestamps) for cross-engine hash stability.
    */
  def clickAttribution(clicks: DataFrame, views: DataFrame,
                       window: String = "4 hours",
                       watermark: String = "10 minutes"): DataFrame =
    attributionJoin(clicks, views, window, watermark, "inner")

  /** Stream-stream LEFT OUTER interval join — [[clickAttribution]] with
    * unattributed clicks KEPT (null view side): the outer variant is a
    * genuinely different streaming capability, because the engine can
    * emit the null row only once the watermark PROVES no matching view
    * can still arrive (inner joins emit eagerly; outer joins emit the
    * null at state eviction). Batch mode is the plain left_outer with
    * the same predicate, which is what the oracle replays; the
    * incremental path needs a watermark-advancing tail (spec-driven,
    * same sentinel technique as the chained rollup).
    */
  def clickAttributionOuter(clicks: DataFrame, views: DataFrame,
                            window: String = "4 hours",
                            watermark: String = "10 minutes"): DataFrame =
    attributionJoin(clicks, views, window, watermark, "left_outer")

  /** RIGHT OUTER: the unmatched-IMPRESSION side — views no click ever
    * converted (null click side). What a funnel/attribution pipeline
    * reads to price unconverted inventory; watermark-eviction semantics
    * mirror the left-outer case with the null on the other side.
    */
  def clickAttributionRight(clicks: DataFrame, views: DataFrame,
                            window: String = "4 hours",
                            watermark: String = "10 minutes"): DataFrame =
    attributionJoin(clicks, views, window, watermark, "right_outer")

  /** FULL OUTER: both unmatched sides in one stream — unattributed
    * clicks AND unconverted views, each emitted once the watermark
    * proves no match can still arrive. Supported by Spark 4 with
    * watermarks plus a time-range condition on both inputs (this join
    * has both); `user_id` coalesces across sides since either can be
    * null.
    */
  def clickAttributionFull(clicks: DataFrame, views: DataFrame,
                           window: String = "4 hours",
                           watermark: String = "10 minutes"): DataFrame =
    attributionJoin(clicks, views, window, watermark, "full_outer")

  private def attributionJoin(clicks: DataFrame, views: DataFrame,
                              window: String, watermark: String,
                              joinType: String): DataFrame = {
    val c = watermarked(clicks, watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val v = watermarked(views, watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("_vu"),
        col("ts").as("view_ts"))
    c.join(v,
        col("user_id") === col("_vu") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $window") &&
          col("view_ts") <= col("click_ts"),
        joinType)
      // coalesce is an identity for inner/left (click side non-null
      // there); right/full need the view side's key on unmatched rows
      .select(col("click_id"), col("view_id"),
        coalesce(col("user_id"), col("_vu")).as("user_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
  }
}

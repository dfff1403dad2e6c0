package graft

import graft.streaming.{EventStream, StatefulSessions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream operators run in batch mode over the events table — the
  * same logical queries EventStream runs incrementally (its transforms
  * are batch/stream agnostic; StreamingSpec drives the incremental path).
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "st_event_windows" -> ((s, dir) =>
      EventStream.windowedCounts(Tables.events(s, dir))),

    // Chained window aggregation (hour → day) — two stateful operators
    // in one query on the streaming side; the batch analog here is the
    // oracle-checked twin.
    "st_daily_rollup" -> ((s, dir) =>
      EventStream.dailyRollup(Tables.events(s, dir))),
    "st_session_counts" -> ((s, dir) =>
      EventStream.sessionCounts(Tables.events(s, dir))),

    // transformWithState (arbitrary-state v2) gap sessionizer, batch
    // analog: closed sessions only — each user's LAST session stays
    // open by contract (in streaming the event-time timer emits it; in
    // batch timers cannot fire). The oracle mirrors exactly that.
    "st_sessions_tws" -> ((s, dir) =>
      StatefulSessions.sessionSummaries(Tables.events(s, dir),
        gapMinutes = 30).toDF()),

    // arbitrary-state v2 MAPSTATE census: incrementally maintained
    // per-user (type → count) map; the batch analog emits the exact
    // full-corpus distinct-type census in one pass.
    "st_type_census" -> ((s, dir) =>
      graft.streaming.TypeCensus.typeCensus(Tables.events(s, dir)).toDF()),

    // arbitrary-state v2 LISTSTATE last-K tracker, batch analog: one
    // trigger over the corpus emits exactly the last-K-per-user window
    // census the oracle replays.
    "st_recent_items" -> ((s, dir) =>
      graft.streaming.RecentItems.recentItems(Tables.events(s, dir), k = 5)
        .toDF()),

    // Streaming dedup analog: duplicate-by-construction input (events ∪
    // events) → unique-id survivors; rows carry identical values, so the
    // arbitrary-survivor pick is value-deterministic.
    "st_dedup_events" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      EventStream.dedupedEvents(ev.unionByName(ev))
        .select("event_id", "user_id", "event_type")
    }),

    // Stream-static broadcast enrichment against the customer dimension.
    "st_enrich_join" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      EventStream.enriched(Tables.events(s, dir), dim)
        .select("event_id", "user_id", "event_type", "segment")
    }),

    // flatMapGroupsWithState: per-user lifetime sequence numbers.
    "st_event_seq" -> ((s, dir) =>
      EventStream.sequencedEvents(Tables.events(s, dir)).toDF()),

    // flatMapGroupsWithState EWMA: the streaming twin of x_ewma — one
    // long of state per user, same integer recurrence, same oracle
    // family (recursive CTE).
    "st_ewma" -> ((s, dir) =>
      EventStream.ewmaStream(Tables.events(s, dir), alphaMicro = 300000L)
        .toDF()),

    // Stream-stream interval join: clicks × same-user views within the
    // preceding 4 hours (bounded join state; oracle replays the predicate).
    "st_stream_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      EventStream.clickAttribution(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"))
    }),

    // LEFT OUTER stream-stream join: unattributed clicks kept with a
    // null view side — streaming emits the null only at watermark-
    // proven state eviction; the batch analog here replays as a plain
    // left join.
    "st_stream_join_outer" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      EventStream.clickAttributionOuter(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"))
    }),

    // RIGHT OUTER: unconverted views kept with a null click side.
    "st_stream_join_right" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      EventStream.clickAttributionRight(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"))
    }),

    // FULL OUTER: both unmatched sides — streaming emits each null row
    // only at watermark-proven state eviction (spec-driven); the batch
    // analog is the plain full join the oracle replays.
    "st_stream_join_full" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      EventStream.clickAttributionFull(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"))
    }),

    // Streaming ingestion dedup (batch analog): re-ingest copies of the
    // corpus ∪ suffix-modified novel docs; only novel fingerprints
    // survive, one row per fp. Output is the fp alone — the survivor's
    // doc_id is an arbitrary pick among identical payloads, so it stays
    // out of the hash-compared columns.
    "st_doc_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        .unionByName(d.where(col("doc_id") % 3 === 1)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat(col("text"), lit(" xnovel")).as("text")))
        .unionByName(d.where(col("doc_id") % 3 === 1)   // in-batch repeat
          .select((col("doc_id") + lit(3000000L)).as("doc_id"),
            concat(col("text"), lit(" xnovel")).as("text")))
      val corpusFps = d.select(
        graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
      graft.streaming.DocStream.newUniqueDocs(batch, corpusFps)
        .select("fp")
    }),

    // Continuously-maintained dataset card (batch analog): per-language
    // counter + theta distinct-fp estimate in ONE aggregation — the
    // sketch runs exact at this scale, so the oracle replays it as
    // COUNT(DISTINCT md5(norm)). StreamingSpec drives the same
    // transform as a 2-trigger complete-mode stream.
    "st_running_cards" -> ((s, dir) =>
      graft.streaming.DocStream.runningCards(Tables.documents(s, dir))),

    // Streaming quantile card (batch analog): per-language doc-length
    // p50/p90 from the KLL sketch in streaming state — exact order
    // statistics at this scale, so the oracle replays ⌈q·n⌉ ranks.
    // StreamingSpec drives the same transform as a 2-trigger
    // complete-mode stream.
    "st_quantile_cards" -> ((s, dir) =>
      graft.streaming.DocStream.runningQuantileCards(
        Tables.documents(s, dir))),

    // Streaming drift: hourly value-histogram census (the stateful
    // half) + per-window PSI against the even-event-id baseline census
    // (census-grain scoring). Alert contract: psi > 0.25.
    "st_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val baseline = graft.operators.HistQuantile.histogram(
          ev.where(col("event_id") % 2 === 0), col("value"), 0.0, 512.0, 64)
        .select(col("bucket"), col("cnt").as("n_expected"))
      EventStream.psiOfWindows(
        EventStream.windowedHistogram(ev, 0.0, 512.0, 64), baseline)
    }),

    // Per-window top-k heaviest users through the custom heap operator
    // (the rate-limit dashboard staple): same aggregation batch and
    // streamed; streaming ranks in foreachBatch (pinned in
    // StreamingSpec), this twin is the oracle-checked batch path.
    "st_top_talkers" -> ((s, dir) =>
      EventStream.topTalkers(Tables.events(s, dir), k = 3)),

    // Exactly-once streamed sink: a REAL Structured Streaming query
    // (file source, maxFilesPerTrigger=1 → two epochs) drains the
    // events frame through foreachBatch + epoch-idempotent manifest
    // commits, then the gate returns the COMMITTED snapshot — which
    // must hash-equal the plain batch frame (the oracle). Fresh temp
    // dirs per invocation keep Bench's repeated samples independent.
    "st_manifest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-stmanifest")
      val srcDir = tmp.resolve("src")
      java.nio.file.Files.createDirectories(srcDir)
      def stage(df: DataFrame, name: String): Unit = {
        val st = java.nio.file.Files.createTempDirectory("graft-stage")
        df.coalesce(1).write.mode("overwrite").parquet(st.toString)
        val part = st.toFile.listFiles()
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .getOrElse(sys.error(s"no part file under $st"))
        java.nio.file.Files.move(part.toPath, srcDir.resolve(name))
      }
      stage(ev.where(col("event_id") % 2 === 0), "a.parquet")
      stage(ev.where(col("event_id") % 2 === 1), "b.parquet")
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      graft.streaming.StreamCommit.runCommitted(stream,
        tmp.resolve("table").toString, tmp.resolve("ckpt").toString)
      graft.streaming.StreamCommit.readCommitted(s, tmp.resolve("table").toString)
    })
  )

  val oracles: Map[String, String] = Map(
    // streamed-committed snapshot ≡ the batch frame
    "st_manifest" ->
      """SELECT event_id, user_id, event_type FROM events""".stripMargin,

    "st_top_talkers" ->
      """WITH tc AS (
        |  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |    user_id, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, user_id, n FROM (
        |  SELECT window_start, user_id, n,
        |    row_number() OVER (PARTITION BY window_start
        |      ORDER BY n DESC, user_id ASC) AS rn
        |  FROM tc) WHERE rn <= 3""".stripMargin,

    "st_quantile_cards" ->
      """WITH sq AS (
        |  SELECT coalesce(lang, 'unknown') AS lang, n_chars,
        |    row_number() OVER (PARTITION BY coalesce(lang, 'unknown')
        |      ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY coalesce(lang, 'unknown')) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang, max(n)::BIGINT AS n_docs,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |    THEN n_chars END)::DOUBLE AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
        |    THEN n_chars END)::DOUBLE AS p90
        |FROM sq GROUP BY lang""".stripMargin,

    "st_running_cards" ->
      """SELECT coalesce(lang, 'unknown') AS lang, count(*) AS n_docs,
        |  count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')))) AS distinct_fp
        |FROM documents GROUP BY 1""".stripMargin,

    "st_event_windows" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "st_daily_rollup" ->
      """WITH h AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS hw,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(time_bucket(INTERVAL '1 day', hw), '%Y-%m-%d') AS day,
        |  event_type, sum(n)::BIGINT AS n_events,
        |  count(*)::BIGINT AS n_active_hours
        |FROM h GROUP BY 1, 2""".stripMargin,

    "st_session_counts" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '30 minutes' OR
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM ev),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,

    // closed sessions only (drop each user's last session): the exact
    // batch-analog contract of the transformWithState sessionizer
    "st_sessions_tws" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
        |    CAST(round(coalesce(value, 0) * 1e6) AS BIGINT) AS vmicro
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR
        |      ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS ns
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid,
        |    epoch_us(min(ts))::BIGINT AS start_us,
        |    epoch_us(max(ts))::BIGINT AS end_us,
        |    count(*)::BIGINT AS n_events,
        |    sum(vmicro)::BIGINT AS sum_value_micro
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, start_us, end_us, n_events, sum_value_micro
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY sid DESC) AS rk FROM agg)
        |WHERE rk > 1""".stripMargin,

    "st_type_census" ->
      """SELECT user_id, count(DISTINCT coalesce(event_type, ''))::BIGINT AS n_types,
        |  count(*)::BIGINT AS n_events
        |FROM events WHERE user_id IS NOT NULL GROUP BY 1""".stripMargin,

    // last-K per user by (ts µs, event_id) — ts::TIMESTAMP truncates
    // ns → µs so both engines break ties identically
    "st_recent_items" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    coalesce(event_type, '') AS et
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rk
        |  FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_recent,
        |  count(DISTINCT et)::BIGINT AS n_types,
        |  max(CASE WHEN rk = 1 THEN et END) AS last_type
        |FROM r WHERE rk <= 5 GROUP BY 1""".stripMargin,

    "st_dedup_events" ->
      """SELECT DISTINCT event_id, user_id, event_type FROM events""",

    "st_enrich_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    // ts::TIMESTAMP truncates DuckDB's ns precision to µs — the precision
    // Spark sees — so both engines break ties the same way (by event_id)
    "st_event_seq" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts::TIMESTAMP, event_id) AS seq
        |FROM events""".stripMargin,

    "st_drift" ->
      """WITH base AS (
        |  SELECT least(greatest(floor((value - 0.0) / 8.0), 0), 63)::BIGINT AS bucket,
        |    count(*)::BIGINT AS n_expected
        |  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
        |cen AS (
        |  SELECT (epoch_us(ts::TIMESTAMP) // 3600000000) * 3600000000 AS ws,
        |    least(greatest(floor((value - 0.0) / 8.0), 0), 63)::BIGINT AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wins AS (SELECT DISTINCT ws FROM cen),
        |bdom AS (SELECT bucket FROM base UNION SELECT bucket FROM cen),
        |netot AS (SELECT sum(n_expected)::BIGINT AS ne FROM base),
        |natot AS (SELECT ws, sum(cnt)::BIGINT AS na FROM cen GROUP BY 1),
        |grid AS (
        |  SELECT w.ws, d.bucket,
        |    coalesce(b.n_expected, 0)::BIGINT AS n_expected,
        |    coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM wins w CROSS JOIN bdom d
        |  LEFT JOIN base b ON b.bucket = d.bucket
        |  LEFT JOIN cen c ON c.ws = w.ws AND c.bucket = d.bucket),
        |t AS (
        |  SELECT g.ws,
        |    CAST(round(
        |      (greatest(g.n_expected::DOUBLE, 0.5) / (SELECT ne FROM netot)
        |        - greatest(g.cnt::DOUBLE, 0.5) / na.na)
        |      * ln((greatest(g.n_expected::DOUBLE, 0.5) / (SELECT ne FROM netot))
        |          / (greatest(g.cnt::DOUBLE, 0.5) / na.na))
        |      * 1e6) AS BIGINT) AS tm
        |  FROM grid g JOIN natot na ON na.ws = g.ws)
        |SELECT ws AS window_start_us, round(sum(tm)::DOUBLE / 1e6, 6) AS psi
        |FROM t GROUP BY 1""".stripMargin,

    "st_ewma" ->
      """WITH RECURSIVE s AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    CAST(round(value * 1e6) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, event_id, ts_us, x, x AS sm FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, s.event_id, s.ts_us, s.x,
        |    (300000 * s.x + 700000 * r.sm) // 1000000
        |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT user_id, event_id, ts_us, x AS value_micro, sm AS ewma_micro
        |FROM r""".stripMargin,

    // µs gap (epoch_us on µs-truncated timestamps) matches Spark's
    // unix_micros exactly
    "st_stream_join" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        |  epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS gap_us
        |FROM events c JOIN events v ON v.user_id = c.user_id
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |  AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL '4 hours'
        |  AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP""".stripMargin,

    "st_stream_join_outer" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        |  epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = c.user_id
        |  AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL '4 hours'
        |  AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP""".stripMargin,

    "st_stream_join_right" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id,
        |  coalesce(c.user_id, v.user_id) AS user_id,
        |  epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |RIGHT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = c.user_id
        |  AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL '4 hours'
        |  AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP""".stripMargin,

    "st_stream_join_full" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id,
        |  coalesce(c.user_id, v.user_id) AS user_id,
        |  epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = c.user_id
        |  AND v.ts::TIMESTAMP >= c.ts::TIMESTAMP - INTERVAL '4 hours'
        |  AND v.ts::TIMESTAMP <= c.ts::TIMESTAMP""".stripMargin,

    // NOT EXISTS, not NOT IN: the operator is a left_anti join, which
    // KEEPS rows whose fp has no equal in the corpus — under NOT IN one
    // NULL corpus fingerprint would collapse the whole result to zero
    // rows (three-valued logic), silently misreporting the operator
    "st_doc_dedup" ->
      """WITH corpus_fp AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |batch AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' xnovel' FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' xnovel' FROM documents WHERE doc_id % 3 = 1),
        |batch_fp AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM batch)
        |SELECT b.fp FROM batch_fp b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus_fp c WHERE c.fp = b.fp)""".stripMargin
  )
}

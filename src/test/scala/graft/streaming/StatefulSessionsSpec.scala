package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StatefulSessionsSpec extends SparkSpec {

  private val eventsDir = "/root/testdata/sf0.001"
  private val GapUs = 30L * 60L * 1000000L

  private def stage(df: org.apache.spark.sql.DataFrame,
                    dir: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .getOrElse(sys.error(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath, dir.resolve(name))
  }

  /** Driver-side reference sessionization: all sessions per user. */
  private def referenceSessions(): Map[Long, Seq[(Long, Long, Long, Long)]] = {
    val rows = graft.Tables.events(spark, eventsDir)
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"),
        round(coalesce(col("value"), lit(0.0)) * 1e6).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).map { case (uid, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)] // start, end, n, sum
      var cur: Option[(Long, Long, Long, Long)] = None
      for ((_, ts, _, v) <- sorted) {
        cur = cur match {
          case Some((s, l, n, sm)) if ts - l > GapUs =>
            sessions += ((s, l, n, sm)); Some((ts, ts, 1L, v))
          case Some((s, l, n, sm)) =>
            Some((math.min(s, ts), math.max(l, ts), n + 1, sm + v))
          case None => Some((ts, ts, 1L, v))
        }
      }
      cur.foreach(sessions += _)
      uid -> sessions.toSeq
    }
  }

  test("batch analog emits exactly the closed sessions (all but each user's last)") {
    val got = StatefulSessions.sessionSummaries(
        graft.Tables.events(spark, eventsDir), gapMinutes = 30)
      .collect()
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events, s.sum_value_micro))
      .toSet
    val expected = referenceSessions().flatMap { case (uid, ss) =>
      ss.dropRight(1).map(s => (uid, s._1, s._2, s._3, s._4))
    }.toSet
    assert(got == expected)
  }

  test("streaming: closed sessions flow with the batches; event-time timers emit quiet users' final sessions") {
    val ev = graft.Tables.events(spark, eventsDir)
    val mid = ev.selectExpr("percentile_approx(unix_micros(ts), 0.5)")
      .collect()(0).getLong(0)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-tws-stream")
    stage(ev.where(unix_micros(col("ts")) <= mid), streamDir, "a.parquet")
    stage(ev.where(unix_micros(col("ts")) > mid), streamDir, "b.parquet")

    val stream = EventStream.readStream(spark, streamDir.toString)
      .withWatermark("ts", "30 minutes")
    val q = StatefulSessions.sessionSummaries(stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_sessions")
      .option("maxFilesPerTrigger", "1")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))

    val got = spark.table("tws_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val ref = referenceSessions()
    val closed = ref.flatMap { case (uid, ss) =>
      ss.dropRight(1).map(s => (uid, s._1, s._2, s._3, s._4)) }.toSet
    val lasts = ref.flatMap { case (uid, ss) =>
      ss.lastOption.map(s => (uid, s._1, s._2, s._3, s._4)) }.toSet
    assert(closed.subsetOf(got),
      s"missing closed sessions: ${(closed -- got).take(3)}")
    val extra = got -- closed
    assert(extra.subsetOf(lasts),
      s"streaming emitted a non-session row: ${(extra -- lasts).take(3)}")
    // the timer path must actually fire: quiet users whose last session
    // ended long before the final watermark emit WITHOUT more input
    assert(extra.nonEmpty,
      "no final session was emitted by an event-time timer")
  }
}

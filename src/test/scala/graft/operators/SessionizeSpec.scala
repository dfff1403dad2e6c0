package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // (event_id, user_id, ts_us): user 1 = two sessions, user 2 = one
    (1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 2000L), (4L, 1L, 2500L),
    (5L, 2L, 100L))
    .toDF("event_id", "user_id", "us")
    .withColumn("ts", timestamp_micros($"us")).drop("us")

  test("gap breaks sessions; ids and sequences are contiguous") {
    val got = Sessionize.assign(events, gapUs = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getInt(4))).toMap
    assert(got(1L) == ((0L, 1)) && got(2L) == ((0L, 2)),
      s"first session wrong: $got")
    assert(got(3L) == ((1L, 1)) && got(4L) == ((1L, 2)),
      s"second session wrong: $got")
    assert(got(5L) == ((0L, 1)), "single-event user gets session 0")
  }

  test("session rollup: bounds, counts, durations") {
    val got = Sessionize.sessions(events, gapUs = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got((1L, 0L)) == ((2L, 0L, 10L, 10L)))
    assert(got((1L, 1L)) == ((2L, 2000L, 2500L, 500L)))
    assert(got((2L, 0L)) == ((1L, 100L, 100L, 0L)))
  }

  test("a gap exactly at the threshold stays in the same session") {
    val e = Seq((1L, 1L, 0L), (2L, 1L, 1000L))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val ids = Sessionize.assign(e, gapUs = 1000L)
      .select("session_id").as[Long].collect().toSet
    assert(ids == Set(0L), "gap == gapUs must NOT break (strict >)")
  }
}

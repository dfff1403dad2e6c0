package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {

  import spark.implicits._

  private val H = 3600000000L

  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.toDF("user_id", "ts_us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  test("gaps densify with zero counts and the carried value") {
    // user 1: events in hour 0 and hour 3 — hours 1 and 2 are gaps
    val out = GapFill.hourlyDense(ev(
        (1L, 100L, 1L, 2.5), (1L, 3 * H + 5L, 2L, 7.0)))
      .orderBy("hour_us")
      .collect().map(r => (r.getLong(1) / H, r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 2500000L), (1L, 0L, 2500000L),
      (2L, 0L, 2500000L), (3L, 1L, 7000000L)))
  }

  test("an hour's representative value is the LAST event's, event_id tiebreak") {
    val out = GapFill.hourlyDense(ev(
        (1L, 50L, 1L, 1.0), (1L, 60L, 3L, 3.0), (1L, 60L, 2L, 2.0)))
      .collect()
    assert(out.length == 1 && out.head.getLong(3) == 3000000L,
      "duplicate-ts tie must break by event_id (3.0 wins)")
  }

  test("grids are per-user and bounded by each user's own span") {
    val out = GapFill.hourlyDense(ev(
        (1L, 0L, 1L, 1.0), (1L, 2 * H, 2L, 1.0),
        (2L, 10 * H, 3L, 4.0)))
      .collect().map(r => (r.getLong(0), r.getLong(1) / H)).toSet
    assert(out == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 10L)),
      s"got $out")
  }

  test("event totals are conserved across the dense grid") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val dense = GapFill.hourlyDense(events)
    val total = dense.agg(sum("n_events")).head().getLong(0)
    val expected = events
      .where(col("user_id").isNotNull && col("ts").isNotNull).count()
    assert(total == expected)
    // every user's grid is contiguous: rows == span hours + 1
    val bad = dense.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((max("hour_us") - min("hour_us")) / H + 1).as("want"))
      .where(col("n") =!= col("want")).count()
    assert(bad == 0L, s"$bad users with non-contiguous grids")
  }
}

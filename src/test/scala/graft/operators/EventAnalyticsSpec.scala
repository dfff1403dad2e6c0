package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = 1700000000000000L - (1700000000000000L % 86400000000L)

  private def ev(user: Long, dayOffset: Long, usWithinDay: Long, typ: String) =
    (user, day0 + dayOffset * 86400000000L + usWithinDay, typ)

  private def toDf(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex
      .map { case ((u, us, t), i) => (i.toLong, u, us, t) }
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")

  test("cohortRetention: cohorts by first day, offsets count distinct users") {
    val df = toDf(Seq(
      ev(1, 0, 10, "view"), ev(1, 1, 10, "view"), ev(1, 1, 20, "click"),
      ev(2, 0, 30, "view"), // cohort day0, never returns
      ev(3, 1, 10, "view"), ev(3, 3, 10, "view"))) // cohort day1, back at +2
    val out = EventAnalytics.cohortRetention(df)
      .select("cohort_day", "day_offset", "n_active", "cohort_users", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1 - day0 / 86400000000L, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)), "both day-0 users active at offset 0")
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)), "only user 1 returns next day")
    assert(out((1L, 2L)) == ((1L, 1L, 1.0)), "user 3 returns two days later")
    assert(!out.contains((0L, 2L)), "no day-0 user active at offset 2")
  }

  test("funnel: steps must advance strictly in time") {
    val df = toDf(Seq(
      // u1 completes in order
      ev(1, 0, 10, "signup"), ev(1, 0, 20, "view"), ev(1, 0, 30, "click"),
      // u2's click PRECEDES its view — click must not count
      ev(2, 0, 10, "signup"), ev(2, 0, 15, "click"), ev(2, 0, 20, "view"),
      // u3 never signed up — not in the funnel at all
      ev(3, 0, 10, "view"), ev(3, 0, 20, "click")))
    val out = EventAnalytics.funnel(df, Seq("signup", "view", "click"))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 2L), s"unexpected stages: $out")
  }

  test("funnel picks the FIRST qualifying event per step") {
    val df = toDf(Seq(
      ev(1, 0, 10, "signup"), ev(1, 0, 5, "view"), // too early
      ev(1, 0, 40, "view"), ev(1, 0, 20, "view"))) // 20 is first after signup
    val row = EventAnalytics.funnel(df, Seq("signup", "view"))
      .select("t0_us", "t1_us").as[(Long, Long)].head()
    assert(row == ((day0 + 10, day0 + 20)))
  }

  test("funnelCounts: census matches per-user stages") {
    val df = toDf(Seq(
      ev(1, 0, 10, "signup"), ev(1, 0, 20, "view"),
      ev(2, 0, 10, "signup"),
      ev(3, 0, 10, "signup"), ev(3, 0, 20, "view"), ev(3, 0, 30, "click")))
    val out = EventAnalytics.funnelCounts(df, Seq("signup", "view", "click"))
      .select("step", "step_name", "n_users")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, "signup", 3L), (1L, "view", 2L), (2L, "click", 1L)))
  }

  test("funnelWithin: later steps only count inside the conversion window") {
    val df = toDf(Seq(
      ev(1, 0, 10, "signup"), ev(1, 0, 20, "view"),   // inside
      ev(2, 0, 10, "signup"), ev(2, 0, 200, "view"))) // outside a 50us window
    val bounded = EventAnalytics.funnelWithin(df, Seq("signup", "view"),
      windowUs = 50L).select("user_id", "stage")
      .as[(Long, Long)].collect().toMap
    assert(bounded == Map(1L -> 2L, 2L -> 1L), s"got $bounded")
    // windowUs = 0 is the unbounded funnel
    val unbounded = EventAnalytics.funnelWithin(df, Seq("signup", "view"),
      windowUs = 0L).select("user_id", "stage")
      .as[(Long, Long)].collect().toMap
    assert(unbounded == Map(1L -> 2L, 2L -> 2L))
  }

  test("resample: carry-forward grid with as-of-inclusive boundaries") {
    val step = 100L
    val df = toDf(Seq(
      ev(1, 0, 0, "view"),      // t=0, value row 0
      ev(1, 0, 150, "view"),    // t=150
      ev(1, 0, 310, "view")))   // t=310 -> grid 0,100,200,300
      .withColumn("value", $"event_id".cast("double") * 10)
    val out = EventAnalytics.resample(df, step)
      .select("g_us", "value").as[(Long, Double)].collect()
      .map { case (g, v) => (g - day0, v) }.toMap
    assert(out == Map(0L -> 0.0, 100L -> 0.0, 200L -> 10.0, 300L -> 10.0),
      s"got $out")
  }

  test("resample: grid point ON an event observes it; same-instant ties take the latest event") {
    val df = toDf(Seq(
      ev(1, 0, 0, "view"), ev(1, 0, 100, "view"), ev(1, 0, 100, "view")))
      .withColumn("value", $"event_id".cast("double"))
    val out = EventAnalytics.resample(df, 100L)
      .select("g_us", "value").as[(Long, Double)].collect()
      .map { case (g, v) => (g - day0, v) }.toMap
    // two events at t=100 (event_ids 1, 2): the grid point at 100 sees
    // the LATER event_id
    assert(out == Map(0L -> 0.0, 100L -> 2.0), s"got $out")
  }

  test("resample: single-event user gets exactly one grid point") {
    val df = toDf(Seq(ev(9, 0, 42, "view")))
      .withColumn("value", lit(7.5))
    val out = EventAnalytics.resample(df, 1000L)
      .select("user_id", "g_us", "value").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((9L, day0 + 42, 7.5)))
  }

  test("funnel rejects repeated steps") {
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(toDf(Seq(ev(1, 0, 1, "a"))), Seq("a", "a"))
    }
  }

  test("typeTransitions: per-user bigrams, probabilities sum to 1 per source") {
    // user 1: a→b→a→b, user 2: a→a. Transitions: a→b ×2, b→a ×1, a→a ×1
    val rows = Seq((1L, 0L, "a"), (1L, 1L, "b"), (1L, 2L, "a"), (1L, 3L, "b"),
      (2L, 0L, "a"), (2L, 1L, "a"))
    val df = rows.zipWithIndex.map { case ((u, m, t), i) => (i.toLong, u, m, t) }
      .toDF("event_id", "user_id", "m", "event_type")
      .withColumn("ts", timestamp_micros($"m" * 60000000L + day0)).drop("m")
    val got = EventAnalytics.typeTransitions(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b")) == ((2L, 0.666667)))
    assert(got(("a", "a")) == ((1L, 0.333333)))
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.size == 3) // no cross-user transition (u1's b → u2's a)
  }

  test("rateAnomalies: spike window flags, steady windows don't, σ=0 → null z") {
    // type "a": hourly counts 2,2,2,14 → mean 5, var 27, σ≈5.196;
    // |14−5| = 9 > 2σ ≈ 10.39? NO → pick a bigger spike: 2,2,2,26 →
    // mean 8, var 108/... recompute: s1=32, s2=4+4+4+676=688, nw=4,
    // mean 8, var = (688 − 1024/4)/4 = 108, σ≈10.39, spike |26−8| = 18
    // < 20.78? still no. Use k behavior directly: 1,1,1,41 → mean 11,
    // var = (1684 − 1936/4)/4 = 300, σ≈17.3, |41−11| = 30 < 34.6. Var
    // scales with the spike² — a single extreme among few windows
    // can't exceed 2σ (z_max = √(nw−1) ≈ 1.73 at nw=4). Use 8 steady
    // windows + 1 spike: z_max = √8 ≈ 2.83 > 2.
    val hour = 3600000000L
    val steady = (0 until 8).flatMap(h => Seq.fill(2)((1L, h.toLong, "a")))
    val spike = Seq.fill(20)((1L, 8L, "a"))
    val constant = (0 until 3).map(h => (2L, h.toLong, "b"))
    val rows = (steady ++ spike ++ constant).zipWithIndex.map {
      case ((u, h, t), i) => (i.toLong, u, h * hour, t)
    }.toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", timestamp_micros($"ts_us" + day0)).drop("ts_us")
    val out = EventAnalytics.rateAnomalies(rows).cache()
    val aAnom = out.where($"event_type" === "a" && $"anomaly").collect()
    assert(aAnom.length == 1 && aAnom.head.getAs[Long]("n") == 20L)
    // constant type "b": variance 0 → null z, anomaly false everywhere
    val b = out.where($"event_type" === "b").collect()
    assert(b.forall(r => r.isNullAt(r.fieldIndex("z")) && !r.getAs[Boolean]("anomaly")))
  }

  test("journeyNgrams: per-user trigrams don't cross users, shares sum to 1") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    // user 1: a b c d → trigrams abc, bcd; user 2: x y z → xyz
    val rows = Seq(
      (1L, t(1), 1L, "a", 0.0, ""), (2L, t(2), 1L, "b", 0.0, ""),
      (3L, t(3), 1L, "c", 0.0, ""), (4L, t(4), 1L, "d", 0.0, ""),
      (5L, t(1), 2L, "x", 0.0, ""), (6L, t(2), 2L, "y", 0.0, ""),
      (7L, t(3), 2L, "z", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.journeyNgrams(rows, n = 3).collect()
    val paths = out.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(paths.toSet === Set(("a", "b", "c"), ("b", "c", "d"), ("x", "y", "z")))
    // shares are 6dp-rounded (oracle-hash contract): 3 × 0.333333
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-5)
    assert(!paths.contains(("c", "d", "x")), "no cross-user n-grams")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort-retention and funnel analytics over the event log — the
  * product-analytics twins of [[Sessionize]] (beyond-reference surface,
  * SURVEY §2.13). Both stay in day/step grain censuses: nothing
  * event-grain survives past the first aggregate.
  *
  * 100 TB shape: [[cohortRetention]] is distinct (user, day) — one
  * shuffle on user_id — then user-grain cohort assignment reusing the
  * SAME partitioning (cohort agg, size census, and the activity join
  * are all user- or cohort-keyed, so Catalyst reuses the exchange), and
  * a final cohort×offset-grain agg whose cardinality is days², not
  * rows. [[funnel]] is K conditional min-aggregates chained on
  * user_id — each step joins user-grain frames co-partitioned on the
  * same key; events are scanned once per step with the step predicate
  * pushed to the scan. K is the funnel length (small constant), the
  * standard warehouse recipe for order-dependent first-touch funnels.
  */
object EventAnalytics {

  /** Integer day index since the epoch, µs-derived: exact for any
    * timestamp this side of year 287396 (|µs| < 2⁵³).
    */
  private def dayOf(ts: Column): Column =
    floor(unix_micros(ts) / lit(86400000000L)).cast("bigint")

  /** (cohort_day, day_offset, n_active, cohort_users, retention):
    * cohort = a user's first active day; a (cohort, offset) cell counts
    * the cohort's users active that many days later. retention is the
    * 6dp-rounded fraction of the cohort (division → libm rule).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"), dayOf(col("ts")).as("day")).distinct()
    val cohorts = ud.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
    ud.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(sizes, "cohort_day")
      .withColumn("retention", round(col("n_active") / col("cohort_users"), 6))
  }

  /** First-touch ordered funnel: step k counts only events strictly
    * after the user's step-(k−1) timestamp, so out-of-order histories
    * don't skip ahead. Returns one row per user who entered the funnel:
    * (user_id, t0_us..t{K−1}_us nullable, stage = furthest step reached,
    * 1-based).
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame =
    funnelWithin(events, steps, windowUs = 0L)

  /** [[funnel]] with a CONVERSION WINDOW: when `windowUs` > 0, step k
    * only counts events within that horizon of the user's step-0
    * timestamp (the "converted within 7 days" semantics); 0 = unbounded.
    */
  def funnelWithin(events: DataFrame, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    require(windowUs >= 0, s"windowUs must be >= 0, got $windowUs")
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val entered = base.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts_us").as("t0_us"))
    val chained = steps.zipWithIndex.tail.foldLeft(entered) {
      case (acc, (step, i)) =>
        val prev = s"t${i - 1}_us"
        val inWindow =
          if (windowUs == 0L) lit(true)
          else col("ts_us") <= col("t0_us") + windowUs
        val probe =
          if (prev == "t0_us") acc.select(col("user_id"), col("t0_us"))
          else acc.select(col("user_id"), col("t0_us"), col(prev))
        val next = base.where(col("event_type") === step)
          .join(probe, "user_id")
          .where(col("ts_us") > col(prev) && inWindow)
          .groupBy("user_id").agg(min("ts_us").as(s"t${i}_us"))
        acc.join(next, Seq("user_id"), "left_outer")
    }
    val stage = steps.indices.map(i =>
      when(col(s"t${i}_us").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    chained.withColumn("stage", stage)
  }

  /** Time-series resample with carry-forward: a fixed `stepUs` grid per
    * user from their first to last event, each grid point holding the
    * value of the last event at-or-before it (as-of semantics — the
    * union-and-carry window trick from [[AsOf]], no range join). Grid
    * rows sort AFTER events at the same instant, so a grid point lying
    * exactly on an event observes it. Ties between same-instant events
    * resolve by event_id (latest wins).
    *
    * 100 TB shape: bounds agg + grid explode are user-grain (grid size
    * = span/step per user), then ONE window over the user partition —
    * the same single-shuffle shape as [[Sessionize]].
    *
    * Output: (user_id, g_us, value).
    */
  def resample(events: DataFrame, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val ev = events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("value"), col("event_id"))
    val grid = ev.groupBy("user_id")
      .agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
      .select(col("user_id"), col("lo"),
        explode(sequence(lit(0L), expr(s"(hi - lo) div ${stepUs}L"))).as("k"))
      .select(col("user_id"), (col("lo") + col("k") * stepUs).as("g_us"))
    val u = ev
      .select(col("user_id"), col("ts_us"), col("value"),
        lit(0).as("is_grid"), col("event_id"))
      .unionByName(grid.select(col("user_id"), col("g_us").as("ts_us"),
        lit(null).cast("double").as("value"), lit(1).as("is_grid"),
        lit(null).cast("long").as("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_grid"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("v", last(col("value"), ignoreNulls = true).over(w))
      .where(col("is_grid") === 1)
      .select(col("user_id"), col("ts_us").as("g_us"), col("v").as("value"))
  }

  /** Step-grain funnel census from [[funnel]]'s per-user frame:
    * (step, step_name, n_users reaching it) — K rows.
    */
  def funnelCounts(events: DataFrame, steps: Seq[String]): DataFrame = {
    val perUser = funnel(events, steps)
    val spark = events.sparkSession
    import spark.implicits._
    val names = steps.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("step", "step_name")
    val counts = steps.indices.map(i =>
      sum(when(col(s"t${i}_us").isNotNull, 1L).otherwise(0L)).as(s"c$i"))
    val wide = perUser.agg(counts.head, counts.tail: _*)
    val long = steps.indices.map(i =>
      wide.select(lit(i.toLong).as("step"), col(s"c$i").as("n_users")))
      .reduce(_ unionByName _)
    names.join(long, "step")
  }

  /** Volume-anomaly detection over tumbling windows: a (window,
    * event_type) whose count deviates from the type's mean by more than
    * k·σ — the monitoring primitive of an ingestion pipeline (a
    * scraper going dark or a bot flood both show up here first).
    *
    * Mean/variance come from EXACT integer sums (Σn, Σn², window
    * count) rather than the engine's streaming variance kernel —
    * Welford association differs between engines, integer sums don't,
    * so z-scores replay bit-for-bit in the oracle. Two census-grain
    * aggregations (windows, then types); the raw event table is
    * touched once.
    *
    * Output: (window_start, event_type, n, mean, z, anomaly); z null
    * (and anomaly false) for zero-variance types.
    */
  /** First-order Markov transition matrix over per-user event
    * sequences: P(next type | current type) from exact bigram counts —
    * the user-journey model behind "what do users do after an error".
    * One user-partitioned lag window (ties broken by event_id — total
    * order) + a types² census; probabilities are one division of exact
    * integers rounded 6dp. Output: (from_type, to_type, n, p).
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
    val census = pairs.groupBy(col("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = census.groupBy("from_type").agg(sum(col("n")).as("_t"))
    census.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_t"), 6).as("p"))
  }

  /** Top user journeys: the event-type n-gram census over each user's
    * (ts, event_id)-ordered stream — "what are the common 3-step
    * paths?" next to [[typeTransitions]]'s 1-step matrix. One
    * user-partitioned lag window (n−1 lags in the same window — one
    * shuffle), then a types^n-bounded census with per-path share.
    * Output: (t1..tn, n, share) where share is the path's fraction of
    * all complete n-grams, rounded 6dp.
    */
  def journeyNgrams(events: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 2 && n <= 5, s"n must be in [2, 5], got $n")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val base = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val lagged = (1 until n).foldLeft(
      base.withColumn(s"t$n", col("event_type"))) { (df, i) =>
      df.withColumn(s"t${n - i}", lag(col("event_type"), i).over(w))
    }
    val cols = (1 to n).map(i => col(s"t$i"))
    val grams = lagged.where(cols.head.isNotNull)
    val census = grams.groupBy(cols: _*).agg(count(lit(1)).as("n"))
    val tot = census.agg(sum(col("n")).as("_t"))
    census.crossJoin(broadcast(tot))
      .select(cols :+ col("n") :+
        round(col("n").cast("double") / col("_t"), 6).as("share"): _*)
  }

  /** Two-proportion A/B z-test over a deterministic hash split: users
    * land in arm A/B by their md5 parity (the [[HashSplit]] idea), a
    * user converts if they have ≥1 event satisfying `conversion`, and
    * the pooled two-proportion z-statistic compares the arms. Counts
    * are exact integers; the z formula is one fixed-association double
    * chain rounded to 6dp — fully oracle-replayable where an
    * engine-native stats routine would not be. Null z when either arm
    * is empty or the pooled rate is degenerate (0 or 1 — no variance).
    *
    * Output: one row (n_a, n_b, conv_a, conv_b, z).
    */
  def abTest(events: DataFrame, conversion: Column): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(max(when(conversion, 1L).otherwise(0L))
        .as("converted"))
      .withColumn("arm",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(2L)))
    val agg = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0d,
        round((pa - pb) / se, 6)).as("z"))
  }

  def rateAnomalies(events: DataFrame, windowLength: String = "1 hour",
                    k: Double = 2.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val census = events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col("event_type"), col("n"))
    val stats = census.groupBy("event_type")
      .agg(count(lit(1)).as("nw"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
    val mean = col("s1").cast("double") / col("nw")
    val vr = (col("s2").cast("double")
      - col("s1").cast("double") * col("s1") / col("nw")) / col("nw")
    census.join(stats, Seq("event_type"))
      .withColumn("_mean", mean)
      .withColumn("_vr", vr)
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("_mean"), 6).as("mean"),
        when(col("_vr") > 0d,
          round((col("n") - col("_mean")) / sqrt(col("_vr")), 6)).as("z"),
        coalesce(abs(col("n") - col("_mean")) > lit(k) * sqrt(col("_vr"))
          && col("_vr") > 0d, lit(false)).as("anomaly"))
  }
}

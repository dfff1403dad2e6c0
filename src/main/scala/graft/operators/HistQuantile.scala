package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram quantiles — the deterministic,
  * SQL-replayable member of the sketch family (HLL cards, CMS heavy
  * hitters, theta set algebra live in [[CorpusStats]] /
  * [[graft.functions.ThetaSketch]]). Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Unlike KLL/t-digest the equi-width census is rank-exact only to a
  * bucket width, but it is: (a) deterministic — no RNG, so the oracle
  * replays it bit-for-bit; (b) trivially mergeable — counts add, so
  * per-day histograms roll up into monthly cards without re-scanning
  * (the same property the HLL cards exploit); (c) bounded — `buckets`
  * rows of state regardless of corpus size. The estimate error is
  * ≤ one bucket width, which the caller sizes.
  *
  * 100 TB shape: [[histogram]] is one map-side-combined partial agg to
  * ≤ `buckets` rows. [[quantiles]] runs on that census: the one
  * unpartitioned running-sum window is over ≤ `buckets` rows by
  * construction (same justification as the numShards offset table in
  * [[Shuffle]]), and the quantile probe is a cross join of |qs| ×
  * buckets census rows. Nothing corpus-sized leaves the partial agg.
  */
object HistQuantile {

  /** (bucket, cnt) census: equi-width buckets over [lo, hi), out-of-range
    * values clamped into the edge buckets so mass is never dropped
    * (clamping, not error: at merge time different days may overshoot a
    * range fixed once). Null values are excluded. Empty buckets are
    * absent (sparse census).
    */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
                buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / buckets
    val b = least(greatest(floor((value - lit(lo)) / lit(w)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("bigint")
    df.where(value.isNotNull)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge any number of same-parameter censuses: counts add. */
  def merge(hists: Seq[DataFrame]): DataFrame =
    hists.reduce(_ unionByName _).groupBy("bucket").agg(sum("cnt").as("cnt"))

  /** Per-group census: (groupCols..., bucket, cnt) — the grouped twin of
    * [[histogram]], ≤ buckets rows per group, same clamping contract.
    */
  def histogramBy(df: DataFrame, groups: Seq[String], value: Column,
                  lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(groups.nonEmpty, "use histogram() for the ungrouped census")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / buckets
    val b = least(greatest(floor((value - lit(lo)) / lit(w)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("bigint")
    df.where(value.isNotNull)
      .groupBy(groups.map(col) :+ b.as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantiles from a grouped census: the [[quantiles]]
    * interpolation with every window PARTITIONED by the group — each
    * partition holds ≤ buckets census rows, so the running sum is
    * group-parallel and bounded, never global.
    */
  def quantilesBy(hist: DataFrame, groups: Seq[String], lo: Double,
                  hi: Double, buckets: Int, qs: Seq[Double]): DataFrame = {
    require(groups.nonEmpty, "use quantiles() for the ungrouped census")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got $qs")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = (hi - lo) / buckets
    val byGroup = Window.partitionBy(groups.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        byGroup.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(
        byGroup.orderBy("bucket").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val probes = qs.toDF("q")
    cum.crossJoin(broadcast(probes))
      .withColumn("target", ceil(col("q") * col("n")))
      .where(col("cum") >= col("target") &&
        (col("cum") - col("cnt")) < col("target"))
      .select(groups.map(col) :+ col("q") :+
        round(lit(lo) + col("bucket") * lit(w) +
          lit(w) * (col("target") - (col("cum") - col("cnt"))) / col("cnt"),
          6).as("qtile"): _*)
  }

  /** Quantile normalization: map each row's WITHIN-GROUP rank onto the
    * GLOBAL value distribution — the cross-group calibration step that
    * makes one threshold meaningful across languages/sources whose raw
    * score scales differ (a "long" German doc and a "long" Chinese doc
    * land on the same normalized value if they sit at the same
    * percentile of their group). q = r/m from the exact per-group
    * row_number (windows PARTITIONED by group — group-parallel); the
    * inverse CDF comes from the global [[histogram]] census via the
    * same interpolation as [[quantiles]], found by joining each row's
    * target rank into the broadcast ≤buckets-row cumulated census (a
    * bounded nested-loop against ≤`buckets` rows, not a corpus join).
    * Output: (idCol, groups..., value, q, qnorm).
    */
  def normalizeBy(df: DataFrame, idCol: Column, groups: Seq[String],
                  value: Column, lo: Double, hi: Double,
                  buckets: Int): DataFrame = {
    require(groups.nonEmpty, "need at least one group column")
    val w = (hi - lo) / buckets
    val base = df.select(idCol.as("id") +: groups.map(col) :+
      value.as("v"): _*)
    val byGroup = Window.partitionBy(groups.map(col): _*)
    val ranked = base
      .withColumn("r", row_number().over(
        byGroup.orderBy(col("v").asc, col("id").asc)).cast("long"))
      .withColumn("m", count(lit(1)).over(byGroup))
      .withColumn("q", col("r").cast("double") / col("m"))
    val cum = histogram(df, value, lo, hi, buckets)
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    ranked
      .crossJoin(broadcast(cum))
      .withColumn("_t", ceil(col("q") * col("n")))
      .where(col("cum") >= col("_t") && (col("cum") - col("cnt")) < col("_t"))
      .select(col("id") +: groups.map(col) :+ col("v") :+
        round(col("q"), 6).as("q") :+
        round(lit(lo) + col("bucket") * lit(w) +
          lit(w) * (col("_t") - (col("cum") - col("cnt"))) / col("cnt"),
          6).as("qnorm"): _*)
  }

  /** Interpolated quantile estimates from a census. For each q the
    * target rank is ceil(q·N); the estimate interpolates linearly inside
    * the bucket containing that rank:
    * lo + bucket·w + w·(target − cumBefore)/cnt, rounded to 6dp (division
    * goes through libm — the standard oracle-hash rule). qs must lie in
    * (0, 1].
    */
  def quantiles(hist: DataFrame, lo: Double, hi: Double, buckets: Int,
                qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got $qs")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = (hi - lo) / buckets
    // running sum over the ≤buckets-row census — bounded, not corpus-sized
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val probes = qs.toDF("q")
    cum.crossJoin(broadcast(probes))
      .withColumn("target", ceil(col("q") * col("n")))
      .where(col("cum") >= col("target") &&
        (col("cum") - col("cnt")) < col("target"))
      .select(col("q"),
        round(lit(lo) + col("bucket") * lit(w) +
          lit(w) * (col("target") - (col("cum") - col("cnt"))) / col("cnt"),
          6).as("qtile"))
  }

  /** EXACT k-th order statistic (1-based) by iterative range
    * narrowing — the distributed-selection algorithm: each round
    * buckets the CURRENT value range into ≤ 2¹⁶ cells, one census
    * locates the cell containing rank k, and the range shrinks ×2¹⁶ —
    * so any 64-bit domain resolves in ≤ 5 census passes (one extra
    * sign-split round when hi − lo itself overflows a long) with NO
    * global sort and ≤ 2¹⁶ driver rows per round (vs orderBy + row_number's
    * full shuffle sort, or the histogram estimate's one-bucket error).
    * The base frame is cached once; each round filters it.
    *
    * Output one row: (n, k, kth) — the exact value.
    */
  def exactKth(df: DataFrame, value: Column, k: Long): DataFrame = {
    val base = df.select(value.cast("long").as("v"))
      .where(col("v").isNotNull).cache()
    val n = base.count()
    require(k >= 1 && k <= n, s"rank $k out of range 1..$n")
    val mm = base.agg(min(col("v")), max(col("v"))).head()
    var lo = mm.getLong(0)
    var hi = mm.getLong(1)
    var rank = k
    var frame = base
    // full-64-bit domains: hi - lo can overflow a long (which would
    // silently skip the narrowing loop and collect every distinct value
    // to the driver). One sign-split census round restores hi - lo <
    // 2^63, after which all range arithmetic below is exact.
    val rangeOverflows =
      try { Math.subtractExact(hi, lo); false }
      catch { case _: ArithmeticException => true }
    if (rangeOverflows) {
      val negCount = frame.where(col("v") < 0).count()
      if (rank <= negCount) { hi = -1L; frame = frame.where(col("v") < 0) }
      else { rank -= negCount; lo = 0L; frame = frame.where(col("v") >= 0) }
    }
    while (hi - lo >= 65536L) {
      val width = (hi - lo) / 65536L + 1L
      // integer `div`, not `/`: double division on longs misbuckets
      // boundary values once the range spans > 2^53. v - lo cannot
      // overflow here (0 ≤ v - lo ≤ hi - lo < 2^63 after the split
      // above), and both sides are non-negative so truncating div ==
      // floor div.
      val census = frame
        .groupBy(expr(s"(v - ${lo}L) div ${width}L").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var cum = 0L
      var bi = -1L
      census.iterator.takeWhile(_ => bi < 0).foreach { case (b, c) =>
        if (cum + c >= rank) bi = b else cum += c
      }
      rank -= cum
      val lo2 = lo + bi * width
      hi = math.min(hi, lo2 + width - 1L)
      lo = lo2
      frame = frame.where(col("v") >= lo && col("v") <= hi)
    }
    val tail = frame.groupBy("v").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    var ans = tail.head._1
    tail.iterator.takeWhile(_ => cum < rank).foreach { case (v, c) =>
      ans = v; cum += c
    }
    base.unpersist()
    val sp = df.sparkSession
    import sp.implicits._
    Seq((n, k, ans)).toDF("n", "k", "kth")
  }
}

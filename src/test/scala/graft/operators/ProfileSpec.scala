package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: typed min/max (numeric order), nulls and distincts counted") {
    val df = Seq(
      (Some(2L), Some("b")), (Some(10L), None), (None, Some("a")),
      (Some(10L), Some("a"))
    ).toDF("n", "s")
    val out = Profile.profile(df, Seq("n", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // min is 2.0 numerically — a lexicographic min of rendered strings
    // would wrongly say "10.0"
    assert(out("n") == ((4L, 1L, 2L, "2.0", "10.0")), s"got ${out("n")}")
    assert(out("s") == ((4L, 1L, 2L, "a", "b")), s"got ${out("s")}")
  }

  test("correlations: perfect, inverse, and constant pairs") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i, -3.0 * i, 7.0))
      .toDF("a", "b", "c", "k")
    val out = Profile.correlations(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", "b")).contains(1.0))
    assert(out(("a", "c")).contains(-1.0))
    assert(out(("a", "k")).isEmpty, "constant column has no correlation")
    assert(out.size == 6, "C(4,2) pairs")
  }

  test("madOutliers flags only the planted spike") {
    val df = ((1 to 99).map(i => (i.toLong, (i % 10 + 20).toDouble)) :+
      (100L, 400.0)).toDF("id", "v")
    val out = Profile.madOutliers(df, "v", lo = 0.0, hi = 500.0,
      buckets = 500, k = 5.0)
    val flagged = out.select("id").as[Long].collect().toSet
    assert(flagged == Set(100L), s"flagged $flagged")
    val r = out.select("median_est", "mad_est").head()
    assert(r.getDouble(0) > 20 && r.getDouble(0) < 30, "median in the bulk")
    assert(r.getDouble(1) < 10, "MAD reflects the tight spread")
  }

  test("winsorize clips the tails, keeps every row, bulk untouched") {
    import org.apache.spark.sql.functions.col
    val df = ((1L to 98L).map(i => (i, i.toDouble)) ++
      Seq((99L, 10000.0), (100L, -10000.0))).toDF("id", "v")
    val out = Profile.winsorize(df, "v", lo = -10001, hi = 10001,
      buckets = 10000, pLo = 0.05, pHi = 0.95).cache()
    assert(out.count() == 100) // no rows dropped
    val m = out.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Double]("clipped")).toMap
    val (blo, bhi) = {
      val r0 = out.head()
      (r0.getAs[Double]("clip_lo"), r0.getAs[Double]("clip_hi"))
    }
    assert(m(99L) == bhi && m(100L) == blo, "tails clipped to the bounds")
    // mid-bulk values survive within histogram-bucket tolerance
    assert(math.abs(m(50L) - 50.0) < 3)
    assert(out.where(col("clipped") > bhi || col("clipped") < blo).count() == 0)
  }
}

package graft.operators

import graft.SparkSpec

class TimeSeriesStatsSpec extends SparkSpec {

  import spark.implicits._

  private def censusOf(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("bucket", "cnt")

  test("theilSen: exact slope on a clean line, immune to one spike") {
    val clean = TimeSeriesStats.theilSen(censusOf(Seq(10, 13, 16, 19, 22)))
      .head()
    assert(clean.getDouble(1) === 3.0)
    // one huge spike: least squares would bend; the median slope holds
    val spiked = TimeSeriesStats.theilSen(
      censusOf(Seq(10, 13, 999, 19, 22, 25, 28))).head()
    assert(spiked.getDouble(1) === 3.0, s"spike bent the slope: $spiked")
  }

  test("theilSen intercept completes the fit") {
    val r = TimeSeriesStats.theilSen(censusOf(Seq(5, 7, 9, 11))).head()
    assert(r.getDouble(1) === 2.0 && r.getDouble(2) === 5.0)
  }

  test("autocorrelation: period-2 alternation gives r1 < 0 < r2") {
    val acf = TimeSeriesStats.autocorrelation(
        censusOf(Seq(10, 2, 10, 2, 10, 2, 10, 2, 10, 2)), maxLag = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(acf(1L) < -0.5, s"lag-1 must be strongly negative: $acf")
    assert(acf(2L) > 0.5, s"lag-2 must be strongly positive: $acf")
  }

  test("autocorrelation matches a direct scala computation") {
    val xs = Seq(4L, 8L, 5L, 9L, 6L, 10L, 7L, 3L)
    val mu = xs.sum.toDouble / xs.size
    val den = xs.map(x => (x - mu) * (x - mu)).sum
    def ref(k: Int) =
      xs.dropRight(k).zip(xs.drop(k))
        .map { case (a, b) => (a - mu) * (b - mu) }.sum / den
    val acf = TimeSeriesStats.autocorrelation(censusOf(xs), maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (1 to 3).foreach { k =>
      assert(math.abs(acf(k.toLong) - ref(k)) < 1e-6,
        s"lag $k: ${acf(k.toLong)} vs ${ref(k)}")
    }
  }
}

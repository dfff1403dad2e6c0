package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: Seq[(Long, Long)]) = rows.toDF("pred", "actual")

  private def run(cal: Seq[(Long, Long)], test: Seq[(Long, Long)],
                  alphaMicro: Long) =
    Conformal.splitConformal(df(cal), df(test),
      col("pred"), col("actual"), alphaMicro).head()

  test("qhat is the ceil((1-alpha)(n+1))-th residual") {
    // residuals 1..9 (n=9); alpha=0.2: k = ceil(0.8*10) = 8 -> qhat 8
    val cal = (1L to 9L).map(r => (100L, 100L + r))
    val r = run(cal, Seq((100L, 105L), (100L, 109L)), 200000L)
    assert(r.getLong(0) === 9L && r.getLong(1) === 8L)
    assert(r.getLong(2) === 8L)
    // test: residual 5 covered, 9 not
    assert(r.getLong(3) === 2L && r.getLong(4) === 1L)
    assert(r.getDouble(5) === 0.5)
  }

  test("the (n+1) correction matters: k rounds up past the naive rank") {
    // n=4, alpha=0.05: k = ceil(0.95*5) = 5 > 4 -> infinite interval
    val cal = (1L to 4L).map(r => (0L, r))
    val r = run(cal, Seq((0L, 1000000L)), 50000L)
    assert(r.getLong(1) === 5L)
    assert(r.isNullAt(2), "k > n must widen to the infinite interval")
    assert(r.getLong(4) === 1L && r.getDouble(5) === 1.0)
  }

  test("coverage holds at the guaranteed level on exchangeable data") {
    // residuals deterministic pseudo-uniform on [0, 1000): split
    // alternately, coverage must be >= 1 - alpha - small-sample slack
    val all = (0L until 400L).map(i => (0L, (i * 193) % 1000))
    val cal = all.zipWithIndex.collect { case (x, i) if i % 2 == 0 => x }
    val tst = all.zipWithIndex.collect { case (x, i) if i % 2 == 1 => x }
    val r = run(cal, tst, 100000L)
    assert(r.getDouble(5) >= 0.85,
      s"coverage ${r.getDouble(5)} below guarantee-with-slack")
  }

  test("ties in residuals count fully (<= qhat, not <)") {
    val cal = Seq.fill(9)((0L, 5L)) // all residuals 5; k=ceil(0.9*10)=9
    val r = run(cal, Seq((0L, 5L), (0L, 6L)), 100000L)
    assert(r.getLong(2) === 5L)
    assert(r.getLong(4) === 1L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PinballSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], taus: Seq[Long]) =
    Pinball.loss(rows.toDF("g", "y", "p"),
        col("g"), col("y"), col("p"), taus)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("hand-computed asymmetric penalties") {
    // y - p = +10 (under-forecast) and -10 (over-forecast)
    val rows = Seq(("a", 110L, 100L), ("a", 90L, 100L))
    val out = run(rows, Seq(900000L))
    // tau=.9: under costs .9*10=9, over costs .1*10=1 -> mean 5
    val (n, sumMicro, loss) = out(("a", 900000L))
    assert(n === 2L)
    assert(sumMicro === 9000000L + 1000000L)
    assert(loss === 5.0)
  }

  test("tau=0.5 pinball is half the absolute error") {
    val rows = Seq(("a", 7L, 3L), ("a", 1L, 9L), ("a", 5L, 5L))
    val (_, _, loss) = run(rows, Seq(500000L))(("a", 500000L))
    assert(loss === (4 + 8 + 0) / 2.0 / 3.0)
  }

  test("the true quantile minimizes the loss over candidate predictors") {
    // y in 1..100; candidate predictors 10, 50, 90 at tau = .9:
    // the 90th percentile must win
    val ys = (1L to 100L)
    def lossAt(p: Long) =
      run(ys.map(y => ("g", y, p)), Seq(900000L))(("g", 900000L))._3
    assert(lossAt(90L) < lossAt(50L) && lossAt(90L) < lossAt(10L))
    // and at tau = .1 the 10th percentile wins
    def lossLo(p: Long) =
      run(ys.map(y => ("g", y, p)), Seq(100000L))(("g", 100000L))._3
    assert(lossLo(10L) < lossLo(50L) && lossLo(10L) < lossLo(90L))
  }

  test("groups and taus are independent rows") {
    val rows = Seq(("a", 10L, 0L), ("b", 0L, 10L))
    val out = run(rows, Seq(100000L, 900000L))
    assert(out.size === 4)
    assert(out(("a", 900000L))._3 === 9.0) // under-forecast at high tau
    assert(out(("b", 900000L))._3 === 1.0) // over-forecast is cheap there
  }
}

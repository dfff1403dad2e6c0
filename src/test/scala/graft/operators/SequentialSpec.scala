package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequentialSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(Long, Long, Boolean)]) =
    rows.toDF("arm", "bucket", "hit")

  private def run(rows: Seq[(Long, Long, Boolean)],
                  p0: Double = 0.5, p1: Double = 0.8,
                  alpha: Double = 0.05) =
    Sequential.bernoulliEValue(mk(rows), col("arm"), col("bucket"),
        col("hit"), p0, p1, alpha)
      .orderBy("arm", "bucket").collect()

  test("log-e is the weighted success/failure count, cumulative in bucket order") {
    val c = Sequential.constants(0.5, 0.8, 0.05)
    // bucket 1: 2 hits of 3; bucket 2: 1 hit of 1
    val out = run(Seq((0L, 1L, true), (0L, 1L, true), (0L, 1L, false),
      (0L, 2L, true)))
    assert(out.length === 2)
    assert(out(0).getLong(4) === 2 * c.winMicro + c.loseMicro)
    assert(out(1).getLong(4) === 3 * c.winMicro + c.loseMicro)
  }

  test("rejection is sticky once ln(1/alpha) is crossed, even if e dips back") {
    val c = Sequential.constants(0.5, 0.8, 0.05)
    // enough straight wins to cross, then a run of losses pulling loge
    // back under threshold — verdict must stay rejected
    val need = (c.threshMicro / c.winMicro + 1).toInt
    val wins = (1 to need).map(i => (0L, i.toLong, true))
    val losses = (1 to 3 * need).map(i => (0L, (need + i).toLong, false))
    val out = run(wins ++ losses)
    assert(out(need - 1).getBoolean(5), "must reject at the crossing")
    val last = out.last
    assert(last.getLong(4) < c.threshMicro, "loge fell back below")
    assert(last.getBoolean(5), "rejection is anytime-valid: it stands")
  }

  test("arms are independent: a null arm never rejects while the shifted arm does") {
    // arm 0 at the null rate (1 of 2 per bucket), arm 1 all hits
    val rows = (1 to 40).flatMap { b =>
      Seq((0L, b.toLong, b % 2 == 0), (1L, b.toLong, true))
    }
    val out = run(rows)
    val byArm = out.groupBy(_.getLong(0))
    assert(byArm(0L).forall(!_.getBoolean(5)))
    assert(byArm(1L).last.getBoolean(5))
  }

  test("constants validate their contracts") {
    intercept[IllegalArgumentException] {
      Sequential.constants(0.8, 0.5, 0.05) // p1 must exceed p0
    }
    intercept[IllegalArgumentException] {
      Sequential.constants(0.3, 0.5, 1.5)
    }
  }
}

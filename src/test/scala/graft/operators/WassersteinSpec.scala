package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WassersteinSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Boolean)]) =
    Wasserstein.w1ByGroup(rows.toDF("g", "v", "b"),
        col("g"), col("v"), col("b"))
      .orderBy("key").collect()

  test("identical samples have zero distance") {
    val rows = (1L to 30L).flatMap(v => Seq(("x", v, false), ("x", v, true)))
    val r = run(rows).head
    assert(r.getDouble(3) === 0.0)
  }

  test("a constant shift of delta moves W1 by exactly delta") {
    // b is a +7 translation of a: W1 of two point masses = |shift|
    val a = (1L to 20L).map(v => ("x", v, false))
    val b = (1L to 20L).map(v => ("x", v + 7, true))
    val r = run(a ++ b).head
    assert(r.getDouble(3) === 7.0)
  }

  test("hand-computed mixed census") {
    // a = {0, 10}, b = {0, 20}: F_a - F_b is 0 on [0,10), 1/2 on [10,20)
    // => W1 = 5
    val rows = Seq(("x", 0L, false), ("x", 10L, false),
      ("x", 0L, true), ("x", 20L, true))
    val r = run(rows).head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 5.0)
  }

  test("groups are independent; an empty side yields null") {
    val rows = Seq(("p", 1L, false), ("p", 3L, true),
      ("q", 5L, false), ("q", 6L, false)) // q has no b side
    val out = run(rows)
    assert(out.length === 2)
    val p = out.find(_.getString(0) == "p").get
    assert(p.getDouble(3) === 2.0)
    val q = out.find(_.getString(0) == "q").get
    assert(q.isNullAt(3))
  }

  test("W1 dominates the mean shift and is symmetric in sides") {
    val a = Seq(1L, 2L, 9L).map(v => ("x", v, false))
    val b = Seq(4L, 5L, 6L).map(v => ("x", v, true))
    val w1 = run(a ++ b).head.getDouble(3)
    val flipped = Wasserstein.w1ByGroup(
      (a ++ b).toDF("g", "v", "b"), col("g"), col("v"), !col("b"))
      .head.getDouble(3)
    assert(w1 === flipped)
    val meanShift = math.abs((1 + 2 + 9) / 3.0 - (4 + 5 + 6) / 3.0)
    assert(w1 >= meanShift - 1e-9)
  }
}

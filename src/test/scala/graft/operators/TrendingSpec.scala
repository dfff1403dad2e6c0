package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendingSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Boolean)], k: Int) =
    Trending.topChanges(rows.toDF("w", "b"), col("w"), col("b"), k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getString(5))).toMap

  test("new, dropped, up, down, flat all attributed correctly") {
    // period a counts: x=3 y=2 z=1; period b: y=3 x=2 w=1
    val a = Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")
    val b = Seq.fill(3)("y") ++ Seq.fill(2)("x") ++ Seq("w")
    val out = run(a.map((_, false)) ++ b.map((_, true)), k = 2)
    assert(out("x") === ((3L, 2L, 1L, 2L, "down")))
    assert(out("y") === ((2L, 3L, 2L, 1L, "up")))
    assert(!out.contains("z") && !out.contains("w"),
      "items outside both top-k must not appear")
    val out3 = run(a.map((_, false)) ++ b.map((_, true)), k = 3)
    assert(out3("z")._5 === "dropped")
    assert(out3("w")._5 === "new")
  }

  test("off-board counts still come from the census") {
    // u is top in a, barely present in b (outside top-1): n_b real
    val rows = Seq.fill(5)(("u", false)) ++ Seq(("u", true)) ++
      Seq.fill(4)(("v", true)) ++ Seq(("v", false))
    val out = run(rows, k = 1)
    assert(out("u") === ((5L, 1L, 1L, -1L, "dropped")))
    assert(out("v") === ((1L, 4L, -1L, 1L, "new")))
  }

  test("identical periods are all flat") {
    val rows = (1 to 20).flatMap(i =>
      Seq.fill(i)((s"t$i", false)) ++ Seq.fill(i)((s"t$i", true)))
    val out = run(rows, k = 5)
    assert(out.size === 5 && out.values.forall(_._5 == "flat"))
  }
}

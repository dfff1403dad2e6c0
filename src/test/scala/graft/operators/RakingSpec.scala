package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RakingSpec extends SparkSpec {

  import spark.implicits._

  test("one round on a 2x2 with independent margins converges exactly") {
    // counts 10/30 by a, 20/20 by b, independent: one round lands both
    // marginals on uniform target
    val cells = Seq(
      ("x", "p", 5L), ("x", "q", 5L), ("y", "p", 15L), ("y", "q", 15L)
    ).toDF("a", "b", "cnt")
    val fitted = Raking.fit(cells, iterations = 2).cache()
    val byA = Raking.marginals(fitted, "a")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byB = Raking.marginals(fitted, "b")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // uniform target = 500000 micro per value on each dim
    assert(byA.values.forall(v => math.abs(v - 500000L) <= 1),
      s"a-marginals off target: $byA")
    assert(byB.values.forall(v => math.abs(v - 500000L) <= 1),
      s"b-marginals off target: $byB")
  }

  test("interacting margins converge (linearly — measured per round)") {
    // skewed joint: cell (x,p) heavy — the dims interact, so the
    // a-marginal (scaled FIRST each round) is perturbed by the b-half
    // and converges linearly: ~12k micro off at 3 rounds, tight at 8
    val cells = Seq(
      ("x", "p", 40L), ("x", "q", 4L), ("y", "p", 4L), ("y", "q", 12L)
    ).toDF("a", "b", "cnt")
    def offBy(iters: Int, dim: String): Long = {
      val fitted = Raking.fit(cells, iterations = iters)
      Raking.marginals(fitted, dim).collect()
        .map(r => math.abs(r.getLong(1) - 500000L)).max
    }
    // b is scaled last → exactly on target at any round count
    assert(offBy(3, "b") <= 1)
    val a3 = offBy(3, "a")
    val a8 = offBy(8, "a")
    assert(a3 < 15000, s"3-round a-marginal too far off: $a3")
    assert(a8 < 500, s"8-round a-marginal not converged: $a8")
    assert(a8 < a3 / 4, s"no linear convergence: $a3 -> $a8")
  }

  test("weights stay positive and adj_cnt is the weighted mass") {
    val cells = Seq(("x", "p", 7L), ("y", "q", 3L)).toDF("a", "b", "cnt")
    val rows = Raking.fit(cells, iterations = 1).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("weight_micro") > 0)
      val expect = math.round(
        r.getAs[Long]("cnt") * r.getAs[Long]("weight_micro") / 1e6)
      assert(r.getAs[Long]("adj_cnt") == expect)
    }
  }

  test("cells census matches groupBy") {
    val docs = Seq((1L, "en", "s0"), (2L, "en", "s0"), (3L, "de", "s1"))
      .toDF("doc_id", "lang", "source")
    val got = Raking.cells(docs, "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("en", "s0", 2L), ("de", "s1", 1L)))
  }
}

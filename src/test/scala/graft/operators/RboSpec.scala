package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RboSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(String, Long, Long)]) =
    rows.toDF("query", "item", "rank")

  private def run(a: Seq[(String, Long, Long)],
                  b: Seq[(String, Long, Long)],
                  k: Int = 10, pMicro: Long = 900000L) =
    Rbo.rboAtK(mk(a), mk(b), k, pMicro)
      .collect().map(r => r.getString(0)
        -> (if (r.isNullAt(1)) -1L else r.getLong(1), r.getDouble(2)))
      .toMap

  private def rk(q: String, items: Seq[Long]) =
    items.zipWithIndex.map { case (it, i) => (q, it, (i + 1).toLong) }

  test("identical rankings score ~1, disjoint score 0") {
    val a = rk("q", 1L to 10L)
    val out = run(a, a)
    assert(math.abs(out("q")._2 - 1.0) < 1e-6)
    val dis = run(a, rk("q", 11L to 20L))
    assert(dis("q") === ((0L, 0.0)))
  }

  test("weights decay geometrically and sum (with residual) to ~1e9") {
    val (wd, pk) = Rbo.weights(10, 900000L)
    assert(wd.head === 100000000L) // (1-p) = 0.1
    assert(math.abs(wd(1) - 90000000L) <= 1)
    assert(math.abs(wd.sum + pk - 1000000000L) <= 10)
  }

  test("a top-rank swap hurts more than a bottom-rank swap") {
    val base = rk("q", 1L to 10L)
    def swap(items: Seq[Long], i: Int, j: Int) =
      items.updated(i, items(j)).updated(j, items(i))
    val topSwap = run(base, rk("q", swap(1L to 10L, 0, 5)))("q")._2
    val botSwap = run(base, rk("q", swap(1L to 10L, 8, 9)))("q")._2
    assert(topSwap < botSwap, s"top $topSwap !< bottom $botSwap")
    assert(botSwap < 1.0)
  }

  test("hand-computed 2-deep example") {
    // k=2, p=0.5: A=[1,2], B=[2,1]: overlap@1=0, overlap@2=2
    // w1=round(0.5e9)=5e8, w2=round(0.25e9)=2.5e8, pk=round(0.25e9)
    // rbo = (0 + 2.5e8*2/2 + 2.5e8*2/2)/1e9 = 0.5
    val out = run(rk("q", Seq(1L, 2L)), rk("q", Seq(2L, 1L)),
      k = 2, pMicro = 500000L)
    assert(out("q") === ((2L, 0.5)))
  }

  test("one-sided queries appear with rbo 0; ranks past k are ignored") {
    val a = rk("qa", 1L to 3L) ++ Seq(("qb", 99L, 11L))
    val b = rk("qb", 1L to 3L)
    val out = run(a, b, k = 10)
    assert(out("qb")._2 === 0.0, "rank-11 row must not count")
    assert(out.contains("qa") && out("qa")._2 === 0.0)
  }
}

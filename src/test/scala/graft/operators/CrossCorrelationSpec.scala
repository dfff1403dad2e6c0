package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossCorrelationSpec extends SparkSpec {

  import spark.implicits._

  // one row per (group, bucket) with a weight column
  private def run(g: Seq[(String, Long, Long)], r: Seq[(Long, Long)],
                  maxLag: Int) =
    CrossCorrelation.bestLag(g.toDF("g", "b", "v"),
      col("g"), col("b"), col("v"),
      r.toDF("b", "v"), col("b"), col("v"), maxLag)

  private def best(g: Seq[(String, Long, Long)], r: Seq[(Long, Long)],
                   maxLag: Int): Map[String, Long] =
    run(g, r, maxLag).where(col("is_best"))
      .collect().map(rr => rr.getString(0) -> rr.getLong(1)).toMap

  test("a delayed copy recovers its exact delay; aligned recovers zero") {
    val ref = (0L until 20L).map(t => (t, (t * 37) % 11 + 1))
    val delayed = ref.map { case (t, v) => ("late", t + 3, v) }
    val aligned = ref.map { case (t, v) => ("same", t, v) }
    val b = best(delayed ++ aligned, ref, 5)
    assert(b("late") === 3L)
    assert(b("same") === 0L)
  }

  test("a leading copy gets a negative lag") {
    val ref = (5L until 25L).map(t => (t, (t * 13) % 7 + 1))
    val early = ref.map { case (t, v) => ("early", t - 2, v) }
    assert(best(early, ref, 4) === Map("early" -> -2L))
  }

  test("ties break to the smallest shift; zero-overlap lags densified") {
    // constant series: every overlapping lag ties on per-step product;
    // overlap COUNT differs, so dot is maximized at full overlap = 0
    val ref = (0L until 10L).map(t => (t, 2L))
    val g = ref.map { case (t, v) => ("c", t, v) }
    val out = run(g, ref, 12).orderBy("lag").collect()
    assert(out.length === 25)
    val bst = out.filter(_.getBoolean(4))
    assert(bst.length === 1 && bst.head.getLong(1) === 0L)
    // |lag| >= 10 has no overlapping buckets but still appears
    val far = out.filter(r => math.abs(r.getLong(1)) >= 10)
    assert(far.length === 6 && far.forall(r =>
      r.getLong(2) === 0L && r.getLong(3) === 0L))
  }

  test("dot products are the exact shifted sums") {
    val ref = Seq((0L, 2L), (1L, 3L))
    val g = Seq(("x", 0L, 5L), ("x", 1L, 7L))
    val out = run(g, ref, 1).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(0L) === 5 * 2 + 7 * 3)
    assert(out(1L) === 7 * 2) // x(1) vs y(0)
    assert(out(-1L) === 5 * 3) // x(0) vs y(1)
  }
}

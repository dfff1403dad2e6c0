package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnShapleySpec extends SparkSpec {

  import spark.implicits._

  // vectors with maxabs = 127 and integer coords sit exactly on the
  // int8 grid, so the spec's local replay needs no quantization step
  private def mk(rows: Seq[(Long, Long, Seq[Float])]) =
    rows.toDF("vec_id", "label", "embedding")

  /** The paper's sequential recurrence, in micro integers. */
  private def replay(train: Seq[(Long, Long, Seq[Float])],
                     test: (Long, Seq[Float]), k: Int): Map[Long, Long] = {
    def d2(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum.toLong
    val byRank = train.map { case (id, lbl, v) => (id, lbl, d2(v, test._2)) }
      .sortBy(t => (t._3, t._1))
    val n = byRank.length
    val ind = byRank.map { case (_, lbl, _) =>
      if (lbl == test._1) 1L else 0L }
    def cM(j: Int): Long =
      Clustering.roundHalfAway(math.min(k, j) * 1e6 / (k.toDouble * j))
    val nM = Clustering.roundHalfAway(1e6 / n)
    val s = new Array[Long](n)
    s(n - 1) = ind(n - 1) * nM
    for (i <- n - 2 to 0 by -1)
      s(i) = s(i + 1) + (ind(i) - ind(i + 1)) * cM(i + 1)
    byRank.map(_._1).zip(s).toMap
  }

  test("matches the sequential recurrence exactly (single test point)") {
    // two clusters around (100,0) and (-100,0); test label 1 at (90,10)
    val train = Seq(
      (1L, 1L, Seq(100f, 0f, 127f)), (2L, 1L, Seq(110f, 5f, 127f)),
      (3L, 0L, Seq(-100f, 0f, 127f)), (4L, 0L, Seq(-110f, 5f, 127f)),
      (5L, 0L, Seq(80f, -5f, 127f)), (6L, 1L, Seq(-90f, 10f, 127f)))
    val testRow = (7L, 1L, Seq(90f, 10f, 127f))
    val out = KnnShapley.valueByKnn(mk(train :+ testRow),
        col("vec_id") === 7, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = replay(train, (1L, testRow._3), k = 2)
    assert(out === want)
  }

  test("a mislabeled nearest neighbor gets negative value") {
    // point 5 sits nearest the test but carries the wrong label
    val train = Seq(
      (1L, 1L, Seq(100f, 0f, 127f)), (2L, 1L, Seq(105f, 5f, 127f)),
      (3L, 0L, Seq(-100f, 0f, 127f)), (4L, 0L, Seq(-105f, 5f, 127f)),
      (5L, 0L, Seq(92f, 9f, 127f)))
    val out = KnnShapley.valueByKnn(mk(train :+ (9L, 1L, Seq(90f, 10f, 127f))),
        col("vec_id") === 9, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(5L) < 0, s"mislabeled neighbor must hurt: ${out(5L)}")
    assert(out(1L) > 0 && out(2L) > 0, "true neighbors must help")
  }

  test("shard-count invariant and panel rows excluded") {
    val rows = (0L until 60L).map { i =>
      (i, i % 3, Seq((((i * 37) % 255) - 127).toFloat,
        (((i * 91) % 255) - 127).toFloat, 127f))
    }
    def go(sh: Int) = KnnShapley.valueByKnn(mk(rows),
        col("vec_id") % 20 === 0, k = 3, shards = sh)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val a = go(1); val b = go(7)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 57)
    assert(!a.exists(t => t._1 % 20 == 0), "panel ids must not be valued")
  }

  test("values sum to the panel's KNN utility (Shapley efficiency)") {
    val rows = (0L until 40L).map { i =>
      (i, i % 2, Seq((((i * 53) % 255) - 127).toFloat,
        (((i * 17) % 255) - 127).toFloat, 127f))
    }
    val k = 4
    val df = mk(rows)
    val total = KnnShapley.valueByKnn(df, col("vec_id") % 10 === 0, k)
      .agg(sum("value_micro")).head().getLong(0)
    // efficiency: sum of values = sum over tests of (matches in top-k)/k;
    // micro rounding perturbs each test by < k·1 micro units
    val tests = rows.filter(_._1 % 10 == 0)
    val train = rows.filterNot(_._1 % 10 == 0)
    val want = tests.map { t =>
      val topk = train.map { case (id, lbl, v) =>
        val d = v.zip(t._3).map { case (x, y) =>
          (x - y).toDouble * (x - y) }.sum.toLong
        (d, id, lbl)
      }.sorted.take(k)
      math.round(topk.count(_._3 == t._2) * 1e6 / k)
    }.sum
    // micro-rounded coefficients perturb each test's telescoped total
    // by well under train-size micro units (observed: single digits)
    assert(math.abs(total - want) <= tests.length * train.length,
      s"efficiency: got $total want ~$want")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileNormSpec extends SparkSpec {

  import spark.implicits._

  test("same within-group percentile maps to the same global value") {
    // group a: 1..100; group b: 101..200 (completely different scales)
    val df = ((1 to 100).map(i => (i.toLong, "a", i.toLong)) ++
      (1 to 100).map(i => (i.toLong + 1000, "b", i.toLong + 100)))
      .toDF("doc_id", "g", "v")
    val out = HistQuantile.normalizeBy(df, col("doc_id"), Seq("g"),
        col("v"), lo = 0.0, hi = 200.0, buckets = 50)
      .collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getDouble(4)))
    val a = out.filter(_._1 == "a").map(t => t._2 -> t._3).toMap
    val b = out.filter(_._1 == "b").map(t => t._2 -> t._3).toMap
    assert(a.keySet === b.keySet, "identical rank structure → identical q")
    a.keySet.foreach { q =>
      assert(a(q) === b(q), s"q=$q must normalize identically: ${a(q)} vs ${b(q)}")
    }
  }

  test("qnorm is monotone in q within a group") {
    val df = (1 to 60).map(i => (i.toLong, "a", (i * 7 % 50).toLong))
      .toDF("doc_id", "g", "v")
    val rows = HistQuantile.normalizeBy(df, col("doc_id"), Seq("g"),
        col("v"), 0.0, 64.0, 32)
      .orderBy("q").collect().map(_.getDouble(4))
    assert(rows.zip(rows.tail).forall { case (x, y) => x <= y })
  }

  test("top rank maps to the global maximum's bucket edge") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 40L))
      .toDF("doc_id", "g", "v")
    val top = HistQuantile.normalizeBy(df, col("doc_id"), Seq("g"),
        col("v"), 0.0, 64.0, 64)
      .where(col("q") === 1.0).head()
    // q=1 → target 3 → bucket 40 (w=1), cumBefore 2, cnt 1 → 40 + 1·1/1
    assert(top.getDouble(4) === 41.0)
  }
}

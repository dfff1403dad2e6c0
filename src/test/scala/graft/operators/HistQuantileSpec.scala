package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def vals = (1 to 1000).map(_.toDouble).toDF("v")

  test("histogram census counts every non-null row, clamps the range") {
    val h = HistQuantile.histogram(
      vals.unionByName(Seq(-50.0, 5000.0).toDF("v"))
        .unionByName(Seq(Option.empty[Double]).toDF("v")),
      $"v", lo = 0.0, hi = 1000.0, buckets = 10)
    val m = h.as[(Long, Long)].collect().toMap
    assert(m.values.sum == 1002L, "null excluded, out-of-range clamped in")
    assert(m(0L) == 100L, "bucket 0 = 1..99 plus the clamped -50")
    assert(m(9L) == 102L, "bucket 9 = 901..1000 (1000 clamps) plus 5000")
  }

  test("day-sharded merge equals the whole-corpus census") {
    val parts = (0 until 4).map(r =>
      HistQuantile.histogram(vals.where($"v".cast("long") % 4 === r),
        $"v", 0.0, 1000.0, 16))
    val merged = HistQuantile.merge(parts).as[(Long, Long)].collect().toMap
    val whole = HistQuantile.histogram(vals, $"v", 0.0, 1000.0, 16)
      .as[(Long, Long)].collect().toMap
    assert(merged == whole, "counts must add across shards")
  }

  test("quantile estimates are within one bucket width of exact") {
    val h = HistQuantile.histogram(vals, $"v", 0.0, 1000.0, 100)
    val est = HistQuantile.quantiles(h, 0.0, 1000.0, 100,
      Seq(0.25, 0.5, 0.9, 0.99, 1.0)).as[(Double, Double)].collect().toMap
    val w = 10.0
    for ((q, e) <- est) {
      val exact = math.ceil(q * 1000).toLong.toDouble // values ARE their ranks
      assert(math.abs(e - exact) <= w, s"q=$q est=$e exact=$exact")
    }
    assert(est.size == 5, "every probe answered exactly once")
  }

  test("grouped quantiles match per-group ungrouped runs") {
    val tagged = vals.withColumn("g",
      when($"v" <= 500, "lo").otherwise("hi"))
    val grouped = HistQuantile.quantilesBy(
      HistQuantile.histogramBy(tagged, Seq("g"), $"v", 0.0, 1000.0, 100),
      Seq("g"), 0.0, 1000.0, 100, Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (g <- Seq("lo", "hi"); q <- Seq(0.5, 0.9)) {
      val single = HistQuantile.quantiles(
        HistQuantile.histogram(tagged.where($"g" === g), $"v", 0.0, 1000.0, 100),
        0.0, 1000.0, 100, Seq(q)).as[(Double, Double)].head()._2
      assert(grouped((g, q)) == single, s"group $g q=$q")
    }
  }

  test("quantiles reject probes outside (0, 1]") {
    val h = HistQuantile.histogram(vals, $"v", 0.0, 1000.0, 10)
    intercept[IllegalArgumentException] {
      HistQuantile.quantiles(h, 0.0, 1000.0, 10, Seq(0.0))
    }
  }
}

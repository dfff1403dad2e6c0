package graft.functions

import graft.SparkSpec
import graft.operators.CorpusStats
import org.apache.spark.sql.functions._

class KllSketchSpec extends SparkSpec {

  import spark.implicits._

  test("exact mode: INCLUSIVE quantile is the ceil(q*n)-th order statistic") {
    val df = (1 to 10).map(_.toLong).toDF("v")
    val sk = df.agg(KllSketch.kllAgg(col("v"), 1024)).head()
      .getAs[Array[Byte]](0)
    val s = KllSketch.wrap(sk)
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    assert(s.getQuantile(0.5, INCLUSIVE) === 5.0) // ceil(5) = 5th
    assert(s.getQuantile(0.9, INCLUSIVE) === 9.0)
    assert(s.getQuantile(0.99, INCLUSIVE) === 10.0)
    assert(s.getQuantile(0.05, INCLUSIVE) === 1.0) // ceil(0.5) = 1st
  }

  test("shard sketches merge to the whole-stream sketch in exact mode") {
    val a = Seq(1L, 3L, 5L).toDF("v")
      .agg(KllSketch.kllAgg(col("v"), 1024)).head().getAs[Array[Byte]](0)
    val b = Seq(2L, 4L, 6L).toDF("v")
      .agg(KllSketch.kllAgg(col("v"), 1024)).head().getAs[Array[Byte]](0)
    val merged = KllSketch.wrap(KllSketch.merge(Seq(a, b)))
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    assert(merged.getN === 6L)
    assert(merged.getQuantile(0.5, INCLUSIVE) === 3.0)
    assert(merged.getQuantile(1.0, INCLUSIVE) === 6.0)
  }

  test("compacted sketches keep rank bounds") {
    val df = (1 to 50000).map(_.toLong).toDF("v")
    val sk = df.agg(KllSketch.kllAgg(col("v"), 128)).head()
      .getAs[Array[Byte]](0)
    val s = KllSketch.wrap(sk)
    assert(s.getN === 50000L)
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    val p50 = s.getQuantile(0.5, INCLUSIVE)
    // normalized rank error for k=128 is ~2.4%; allow 5%
    assert(math.abs(p50 - 25000.0) < 2500.0, s"p50 = $p50")
  }

  test("SQL surface: kll_sketch + kll_quantile per group") {
    (1 to 9).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("kll_v")
    val rows = spark.sql(
      """SELECT g, kll_quantile(kll_sketch(v), 0.5) AS p50
        |FROM kll_v GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // g0: {2,4,6,8} → ceil(2)=2nd = 4; g1: {1,3,5,7,9} → 3rd = 5
    assert(rows("g0") === 4.0 && rows("g1") === 5.0)
  }

  test("card quantiles match the order-statistic definition per group") {
    val docs = Seq(
      ("en", "s0", 10L), ("en", "s0", 20L), ("en", "s0", 30L),
      ("fr", "s1", 5L))
      .toDF("lang", "source", "n_chars")
    val out = CorpusStats.datasetCardQuantiles(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    assert(out(("en", "s0")) === ((3L, 20.0, 30.0)))
    assert(out(("fr", "s1")) === ((1L, 5.0, 5.0)))
  }
}

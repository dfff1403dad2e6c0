package graft.functions

import graft.SparkSpec
import graft.operators.Salience
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {

  import spark.implicits._

  test("exact mode: no purge means every estimate equals the truth") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val sk = Salience.freqTokenSketch(docs, maxMapSize = 64)
    val est = Salience.freqEstimates(sk, Seq("a", "b", "c", "zz"))
    assert(est("a") === ((3L, 3L, 3L)))
    assert(est("b") === ((2L, 2L, 2L)))
    assert(est("c") === ((1L, 1L, 1L)))
    assert(est("zz") === ((0L, 0L, 0L)))
  }

  test("purge mode: bounds hold and heavy item is never lost") {
    // 2000 distinct light keys + one heavy key through an 8-slot map
    val rows = (0 until 2000).map(i => s"k$i") ++ Seq.fill(500)("HEAVY")
    val df = rows.toDF("k")
    val sk = df.agg(FreqSketch.freqAgg(col("k"), 8)).head()
      .getAs[Array[Byte]](0)
    val w = FreqSketch.wrap(sk)
    assert(w.getMaximumError > 0L, "stream must purge")
    assert(w.getLowerBound("HEAVY") <= 500L
      && 500L <= w.getUpperBound("HEAVY"))
    val hitters = Salience.freqHitters(sk).map(_._1).toSet
    assert(hitters.contains("HEAVY"))
  }

  test("disjoint shard sketches merge to the whole-stream sketch") {
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("y", "z").toDF("k")
    val ska = a.agg(FreqSketch.freqAgg(col("k"), 64)).head().getAs[Array[Byte]](0)
    val skb = b.agg(FreqSketch.freqAgg(col("k"), 64)).head().getAs[Array[Byte]](0)
    val merged = Salience.mergeFreqSketches(Seq(ska, skb))
    val est = Salience.freqEstimates(merged, Seq("x", "y", "z"))
    assert(est("x") === ((2L, 2L, 2L)))
    assert(est("y") === ((2L, 2L, 2L)))
    assert(est("z") === ((1L, 1L, 1L)))
  }

  test("SQL surface: freq_sketch aggregates per group") {
    Seq(("g1", "t"), ("g1", "t"), ("g2", "u")).toDF("g", "k")
      .createOrReplaceTempView("freq_v")
    val rows = spark.sql(
      "SELECT g, freq_sketch(k, 64) AS sk FROM freq_v GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(FreqSketch.wrap(rows("g1")).getEstimate("t") === 2L)
    assert(FreqSketch.wrap(rows("g2")).getEstimate("u") === 1L)
  }

  test("rejects non-power-of-two map sizes and non-string input") {
    intercept[IllegalArgumentException] {
      Seq("a").toDF("k").agg(FreqSketch.freqAgg(col("k"), 100)).head()
    }
    val e = intercept[Exception] {
      Seq(1L).toDF("k").agg(FreqSketch.freqAgg(col("k"), 64)).head()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}

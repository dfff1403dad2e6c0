package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
      .take(15), 16)
  }

  test("exact key is the max of w independent md5 draws") {
    val df = Seq((7L, 3L), (8L, 1L)).toDF("doc_id", "w")
    val got = WeightedSample.weightedTopK(df, col("doc_id"), col("w"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(7L) === (1 to 3).map(j => h60(s"aes:42:7:$j")).max)
    assert(got(8L) === h60("aes:42:8:1"))
  }

  test("k bounds the sample and higher aggregate weight wins in expectation") {
    // 50 light items (w=1) vs 10 heavy items (w=40): heavies should
    // take most of a k=10 sample under any fixed seed
    val df = ((0 until 50).map(i => (i.toLong, 1L)) ++
      (100 until 110).map(i => (i.toLong, 40L))).toDF("doc_id", "w")
    val ids = WeightedSample.weightedTopK(df, col("doc_id"), col("w"), k = 10)
      .collect().map(_.getLong(0))
    assert(ids.length === 10)
    assert(ids.count(_ >= 100) >= 6, s"heavy items underrepresented: ${ids.toSeq}")
  }

  test("weights above maxWeight clamp to the maxWeight ladder") {
    val a = WeightedSample.weightedTopK(Seq((1L, 999L)).toDF("doc_id", "w"),
      col("doc_id"), col("w"), k = 1, maxWeight = 4L).head().getLong(2)
    val b = WeightedSample.weightedTopK(Seq((1L, 4L)).toDF("doc_id", "w"),
      col("doc_id"), col("w"), k = 1, maxWeight = 4L).head().getLong(2)
    assert(a === b)
  }

  test("log variant: an overwhelming weight is selected first") {
    val df = ((0 until 40).map(i => (i.toLong, 1.0d)) :+ (99L, 1e12d))
      .toDF("doc_id", "w")
    val top = WeightedSample.weightedTopKLog(df, col("doc_id"), col("w"),
      k = 1).head()
    assert(top.getLong(0) === 99L)
  }

  test("log variant keys are ln(u)/w nano-rounded") {
    val df = Seq((5L, 2.0d)).toDF("doc_id", "w")
    val got = WeightedSample.weightedTopKLog(df, col("doc_id"), col("w"),
      k = 1).head().getLong(2)
    val u = (h60("aes:42:5:0").toDouble + 0.5) / 1.152921504606846976e18
    assert(got === math.rint(math.log(u) / 2.0 * 1e9).toLong)
  }

  test("per-group variant returns k per group in global key order") {
    val df = (0 until 30).map(i => (if (i % 2 == 0) "a" else "b",
      i.toLong, 2L)).toDF("lang", "doc_id", "w")
    val rows = WeightedSample.weightedTopKPerGroup(df, col("lang"),
      col("doc_id"), col("w"), k = 3).collect()
    val byGrp = rows.groupBy(_.getString(0))
    assert(byGrp.keySet === Set("a", "b"))
    byGrp.values.foreach { g =>
      assert(g.length === 3)
      // within a group, the winners are the 3 largest keys
      val keys = g.map(_.getLong(3)).sorted.reverse
      assert(g.map(_.getLong(4)).sorted.toSeq === Seq(1L, 2L, 3L))
      assert(g.sortBy(_.getLong(4)).map(_.getLong(3)).toSeq === keys.toSeq)
    }
  }

  test("invalid weights fail loudly instead of mis-sampling") {
    // w = 0 would hit the descending sequence(1, 0) = [1, 0] and draw
    // twice; a negative log-path weight would outrank everything
    val zero = Seq((1L, 1L), (2L, 0L)).toDF("doc_id", "w")
    val e1 = intercept[Exception] {
      WeightedSample.weightedTopK(zero, col("doc_id"), col("w"), k = 2).collect()
    }
    assert(e1.getMessage.contains("weightedTopK requires weight >= 1"))
    val neg = Seq((1L, 2.0), (2L, -1.0)).toDF("doc_id", "w")
    val e2 = intercept[Exception] {
      WeightedSample.weightedTopKLog(neg, col("doc_id"), col("w"), k = 2).collect()
    }
    assert(e2.getMessage.contains("weightedTopKLog requires weight > 0"))
    val zg = Seq(("a", 1L, 1L), ("a", 2L, 0L)).toDF("lang", "doc_id", "w")
    val e3 = intercept[Exception] {
      WeightedSample.weightedTopKPerGroup(zg, col("lang"), col("doc_id"),
        col("w"), k = 1).collect()
    }
    assert(e3.getMessage.contains("weightedTopKPerGroup requires weight >= 1"))
  }
}

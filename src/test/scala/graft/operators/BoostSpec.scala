package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoostSpec extends SparkSpec {

  import spark.implicits._

  test("separable 1-D: round-1 stump at the boundary, zero error, beta clamps to 1") {
    val df = (0L until 100L).map(x => (x, x >= 60L)).toDF("x", "y")
    val st = Boost.train(df, col("y"), Seq((col("x"), 0L, 100L)),
      rounds = 3, bins = 10)
    assert(st.nonEmpty)
    val s1 = st.head
    assert((s1.feature, s1.bin, s1.cl, s1.cr) == (0L, 5L, 0L, 1L))
    assert(s1.errW == 0L && s1.totW == 100L * 1000000L && s1.betaMicro == 1L)
  }

  test("chance-level labels stop the loop with an empty ensemble") {
    // constant feature, perfectly balanced labels: every stump has
    // E = W/2 -> the weak-learner test fails at round 1
    val df = (0L until 40L).map(x => (x, x % 2 == 0)).toDF("x", "y")
    val st = Boost.train(df, col("y"), Seq((lit(3L), 0L, 10L)),
      rounds = 5, bins = 4)
    assert(st.isEmpty)
    intercept[IllegalArgumentException](
      Boost.margin(df, Seq((lit(3L), 0L, 10L)), st))
  }

  test("reweighting shrinks correct rows and preserves misclassified ones") {
    // one noisy point: x=10 labeled positive among negatives
    val rows = (0L until 50L).map(x => (x, x >= 30L || x == 10L))
    val df = rows.toDF("x", "y")
    val st = Boost.train(df, col("y"), Seq((col("x"), 0L, 50L)),
      rounds = 2, bins = 10)
    val s1 = st.head
    // best single cut is at the true boundary, erring only on x=10
    assert(s1.errW == 1000000L)
    assert(s1.betaMicro < 1000000L && s1.betaMicro >= 1L)
    // round 2 exists and its total weight reflects the shrink:
    // 49 rows at beta + the noisy row still at 1e6
    val s2 = st(1)
    assert(s2.totW == 49L * s1.betaMicro + 1000000L)
  }

  test("boosted margin beats the single stump on a two-feature target") {
    // label = (a >= 60) OR (b >= 80): one stump cannot express OR; the
    // ensemble should fix most of the single-cut's mistakes
    val rows = (0L until 400L).map { i =>
      val a = (i * 53 + 7) % 100; val b = (i * 29 + 3) % 100
      (a, b, a >= 60 || b >= 80)
    }
    val df = rows.toDF("a", "b", "y")
    val feats = Seq((col("a"), 0L, 100L), (col("b"), 0L, 100L))
    def acc(rounds: Int): Double = {
      val st = Boost.train(df, col("y"), feats, rounds = rounds, bins = 10)
      val m = Boost.margin(df, feats, st, bins = 10)
        .select(col("y").cast("long").as("y"), col("pred"))
        .collect()
      m.count(r => r.getLong(0) == r.getLong(1)).toDouble / m.length
    }
    val a1 = acc(1); val a8 = acc(8)
    assert(a8 >= a1, s"boosting hurt: $a1 -> $a8")
    assert(a8 > 0.95, s"ensemble accuracy too low: $a8")
  }

  test("train is deterministic run to run") {
    val df = (0L until 100L)
      .map(x => (x, (x * 13 + 5) % 97, x % 3 == 0 || x >= 70L))
      .toDF("a", "b", "y")
    val feats = Seq((col("a"), 0L, 100L), (col("b"), 0L, 97L))
    def run() = Boost.train(df, col("y"), feats, rounds = 4, bins = 8)
    assert(run() == run())
  }

  test("argument guards") {
    val df = Seq((1L, true)).toDF("x", "y")
    intercept[IllegalArgumentException](Boost.train(df, col("y"),
      Seq((col("x"), 0L, 10L)), rounds = 0))
    intercept[IllegalArgumentException](Boost.train(df, col("y"),
      Seq((col("x"), 0L, 10L)), rounds = 1, bins = 1))
    intercept[IllegalArgumentException](Boost.train(df, col("y"),
      Seq.empty, rounds = 1))
  }
}

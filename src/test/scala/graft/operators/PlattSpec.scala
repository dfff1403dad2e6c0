package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlattSpec extends SparkSpec {

  import spark.implicits._

  private def sigma(z: Double) = 1.0 / (1.0 + math.exp(-z))

  // label proportions drawn from sigma(2s + 1) on a score grid
  private def sigmoidRows: Seq[(Long, Boolean)] =
    (-12 to 12).flatMap { i =>
      val s = i * 0.25
      val np = math.round(200 * sigma(2 * s + 1)).toInt
      val sm = math.round(s * 1e6)
      Seq.fill(np)((sm, true)) ++ Seq.fill(200 - np)((sm, false))
    }

  test("recovers the generating sigmoid's slope and intercept") {
    val r = Platt.fit(sigmoidRows.toDF("sm", "label"),
      col("sm"), col("label"), rounds = 8).head()
    val a = r.getLong(2) / 1e6
    val b = r.getLong(3) / 1e6
    assert(math.abs(a - 2.0) < 0.1, s"slope $a should be ~2")
    assert(math.abs(b - 1.0) < 0.1, s"intercept $b should be ~1")
    // calibrated probabilities beat the coin-flip bound on this data
    assert(r.getDouble(4) < math.log(2.0), s"logloss ${r.getDouble(4)}")
  }

  test("parameters are partition-invariant (exact micro determinism)") {
    val df = sigmoidRows.toDF("sm", "label")
    def go(parts: Int) = {
      val r = Platt.fit(df.repartition(parts), col("sm"), col("label"),
        rounds = 5).head()
      (r.getLong(2), r.getLong(3))
    }
    assert(go(1) === go(13))
  }

  test("single-class input fails fast") {
    intercept[IllegalArgumentException] {
      Platt.fit(Seq((0L, true), (1L, true)).toDF("sm", "label"),
        col("sm"), col("label"), rounds = 3)
    }
  }
}

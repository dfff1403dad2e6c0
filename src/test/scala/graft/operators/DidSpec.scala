package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DidSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Int, Int, Long)]) =
    Did.estimate(rows.toDF("g", "p", "y"),
      col("g") === 1, col("p") === 1, col("y")).head()

  test("DiD nets out group baselines and period shocks exactly") {
    // control: 100 -> 110 (shock +10); treated: 200 -> 225
    // => effect = 25 - 10 = 15
    val rows = Seq.fill(5)((0, 0, 100L)) ++ Seq.fill(5)((0, 1, 110L)) ++
      Seq.fill(5)((1, 0, 200L)) ++ Seq.fill(5)((1, 1, 225L))
    val r = run(rows)
    assert(r.getLong(8) === 15000000L) // did_micro
    // zero within-cell variance: se = 0, z undefined
    assert(r.getDouble(9) === 0.0)
    assert(r.isNullAt(10) && r.isNullAt(11))
  }

  test("cell means are the micro-rounded averages") {
    val rows = Seq((0, 0, 1L), (0, 0, 2L), (0, 1, 4L), (0, 1, 4L),
      (1, 0, 10L), (1, 0, 11L), (1, 1, 20L), (1, 1, 23L))
    val r = run(rows)
    assert(r.getLong(4) === 1500000L) // m_c0 = 1.5
    assert(r.getLong(5) === 4000000L)
    assert(r.getLong(6) === 10500000L)
    assert(r.getLong(7) === 21500000L)
    // did = (21.5 - 10.5) - (4 - 1.5) = 8.5
    assert(r.getLong(8) === 8500000L)
    assert(r.getDouble(9) > 0 && !r.isNullAt(10) && !r.isNullAt(11))
  }

  test("a pure period shock with parallel trends estimates zero") {
    val rows = (1 to 20).flatMap { i =>
      val noise = (i % 5).toLong
      Seq((0, 0, 50L + noise), (0, 1, 80L + noise),
        (1, 0, 90L + noise), (1, 1, 120L + noise))
    }
    val r = run(rows)
    assert(r.getLong(8) === 0L)
    assert(math.abs(r.getDouble(11) - 1.0) < 1e-6, "p should be ~1")
  }

  test("a sub-2-row cell nulls the inference but keeps the estimate") {
    val rows = Seq((0, 0, 5L), (0, 1, 6L), (0, 1, 8L),
      (1, 0, 9L), (1, 0, 11L), (1, 1, 30L))
    val r = run(rows)
    assert(r.getLong(8) === (30L - 10L) * 1000000L - (7L - 5L) * 1000000L)
    assert(r.isNullAt(9) && r.isNullAt(10) && r.isNullAt(11))
  }
}

package graft.operators

import graft.SparkSpec

class ForecastSpec extends SparkSpec {

  import spark.implicits._

  private def mase(series: Seq[(Long, Long)], season: Long) =
    Forecast.seasonalNaiveEval(series.toDF("t", "y"), season).head()

  test("hand-computed MASE on a short series") {
    // t: 0..5, season 3. seasonal pairs: (3,0),(4,1),(5,2) errors
    // |4-1|,|1-2|,|5-3| = 3,1,2 -> mean 2; naive pairs: 5 errors
    // |2-1|,|3-2|,|4-3|,|1-4|,|5-1| = 1,1,1,3,4 -> mean 2
    val r = mase(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 5L -> 5L), 3L)
    assert(r.getLong(0) === 6L && r.getLong(1) === 3L && r.getLong(2) === 5L)
    assert(r.getDouble(3) === 1.0)
  }

  test("perfect seasonality scores MASE 0") {
    val wave = (0L until 12L).map(t => t -> (10L + t % 4))
    val r = mase(wave, 4L)
    assert(r.getDouble(3) === 0.0)
  }

  test("gaps contribute no pairs; flat series yields null") {
    // missing t=2: naive pairs only (1,0),(4,3); seasonal (lag 3): (3,0),(4,1)
    val r = mase(Seq(0L -> 5L, 1L -> 7L, 3L -> 6L, 4L -> 9L), 3L)
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    // flat series: naive error mass 0 -> null (division guard)
    val flat = mase((0L until 8L).map(_ -> 3L), 4L)
    assert(flat.isNullAt(3))
  }

  test("season below 2 is rejected") {
    intercept[IllegalArgumentException] {
      Forecast.seasonalNaiveEval(Seq(0L -> 1L).toDF("t", "y"), 1L)
    }
  }
}

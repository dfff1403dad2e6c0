package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalAnomalySpec extends SparkSpec {

  import spark.implicits._

  // one event row per unit of count: (key, bucket) repeated v times
  private def run(series: Map[Long, Long], period: Int, kMicro: Long) = {
    val rows = series.toSeq.flatMap { case (b, v) =>
      Seq.fill(v.toInt)(("s", b))
    }
    SeasonalAnomaly.detect(rows.toDF("g", "b"), col("g"), col("b"),
        lit(1L), period, kMicro)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .toMap
  }

  test("a weekly-periodic series with one spike flags only the spike") {
    // weekly pattern 10,20,30,... repeated; day 17 spikes to 99
    val base = (0L until 28L).map(d => d -> (10L + (d % 7) * 10L)).toMap
    val series = base + (17L -> 99L)
    val out = run(series, period = 7, kMicro = 3000000L)
    // warm-up: days 0..6 have no seasonal twin
    assert(!out.contains(3L) && out.contains(7L))
    assert(out(17L)._4, "the spike must flag")
    // the spike also perturbs day 24 (its residual vs the spiked 17)
    assert(out(24L)._4, "the week after the spike deviates too")
    val calm = out.view.filterKeys(k => k != 17L && k != 24L)
    assert(calm.values.forall(!_._4), "steady rhythm must not alarm")
  }

  test("medians are the lower order statistics, exactly") {
    // residuals engineered: values 10,10,10,13 on a period-1 series:
    // diffs r = 0,0,3 -> med = 0 (lower), dev = 0,0,3 -> mad = 0
    val series = Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 13L)
    val out = run(series, period = 1, kMicro = 2000000L)
    assert(out(1L) === ((0L, 0L, 0L, false)))
    // MAD 0: any nonzero deviation is an anomaly (strict >)
    assert(out(3L) === ((3L, 0L, 0L, true)))
  }

  test("constant series never alarms (0 > k*0 is false)") {
    val out = run((0L until 20L).map(_ -> 5L).toMap, 7, 0L)
    assert(out.nonEmpty && out.values.forall(!_._4))
  }
}

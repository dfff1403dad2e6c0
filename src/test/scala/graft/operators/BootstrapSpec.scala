package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {

  import spark.implicits._

  private def df = (1 to 500).map(i => (i.toLong, (i % 100).toDouble))
    .toDF("id", "v")

  test("threshold ladder is the cumulative Poisson(1) CDF") {
    val t = Bootstrap.thresholds
    assert(t.length === 9)
    assert(math.abs(t.head - math.exp(-1)) < 1e-15)
    assert(math.abs(t(1) - 2 * math.exp(-1)) < 1e-15)
    assert(t.last > 0.999998 && t.last < 1.0)
    assert(t.zip(t.tail).forall { case (a, b) => a < b })
  }

  test("replicates are deterministic in the seed and differ across seeds") {
    def means(seed: Long) =
      Bootstrap.replicateMeans(df, col("v"), col("id"), b = 10, seed = seed)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(means(1L) === means(1L))
    assert(means(1L) !== means(2L))
  }

  test("replicate means scatter around the true mean; n_eff ≈ n") {
    val out = Bootstrap.replicateMeans(df, col("v"), col("id"), b = 30)
      .collect()
    assert(out.length === 30)
    val trueMean = (1 to 500).map(_ % 100).sum / 500.0
    val ms = out.map(_.getDouble(3))
    assert(ms.exists(_ < trueMean) && ms.exists(_ > trueMean),
      s"means must straddle the truth: ${ms.min}..${ms.max} vs $trueMean")
    // Poisson(1) weights: E[n_eff] = n, sd ≈ √n ≈ 22
    val effs = out.map(_.getLong(1))
    assert(effs.forall(e => e > 400 && e < 600), s"n_eff wild: ${effs.toSeq}")
  }

  test("meanCI brackets the full mean with sane ordering") {
    val ci = Bootstrap.meanCI(df, col("v"), col("id"), b = 40).head()
    val (n, full, lo, hi) = (ci.getLong(0), ci.getDouble(1),
      ci.getDouble(2), ci.getDouble(3))
    assert(n === 40L)
    assert(lo <= hi)
    assert(lo <= full && full <= hi,
      s"CI [$lo, $hi] must bracket the full mean $full")
  }
}

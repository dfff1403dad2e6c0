package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {

  import spark.implicits._

  private def split(series: Seq[Long], minSeg: Int = 2) =
    Changepoint.bestSplit(
      series.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("bucket", "cnt"), minSeg).head()

  test("a clean level shift is found at the shift") {
    // 10,10,10,10,10 | 50,50,50,50,50 — split at bucket 5
    val r = split(Seq.fill(5)(10L) ++ Seq.fill(5)(50L))
    assert(r.getLong(0) === 5L)
    assert(r.getDouble(3) === 10.0 && r.getDouble(4) === 50.0)
  }

  test("flat series: score ~0 and no spurious confidence") {
    val r = split(Seq.fill(10)(7L))
    assert(r.getDouble(5) === 0.0)
  }

  test("minSeg guards degenerate end splits") {
    // single outlier at the end; minSeg 3 cannot isolate it
    val r = split(Seq(10L, 10L, 10L, 10L, 10L, 10L, 10L, 99L), minSeg = 3)
    assert(r.getLong(1) >= 3L && r.getLong(2) >= 3L)
  }

  test("matches brute-force SSE minimization") {
    val series = Seq(3L, 4L, 3L, 5L, 20L, 22L, 19L, 21L, 40L, 38L)
    def sse(xs: Seq[Long]): Double = {
      val m = xs.sum.toDouble / xs.size
      xs.map(x => (x - m) * (x - m)).sum
    }
    val best = (2 to series.size - 2).minBy { s =>
      sse(series.take(s)) + sse(series.drop(s))
    }
    assert(split(series).getLong(0) === best.toLong)
  }

  test("census builds from raw rows") {
    val df = Seq((1L, 100L), (2L, 100L), (3L, 200L)).toDF("id", "b")
    val c = Changepoint.census(df, col("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c === Map(100L -> 2L, 200L -> 1L))
  }
}

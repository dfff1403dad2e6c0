package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TailIndexSpec extends SparkSpec {

  import spark.implicits._

  private def run(vs: Seq[Long], k: Long) =
    TailIndex.hill(vs.toDF("v"), col("v"), k).head()

  test("recovers the exponent of an exact Pareto grid") {
    // v_i = floor(1e6 / i) for i = 1..2000 is Pareto with alpha = 1
    val vs = (1 to 2000).map(i => (1000000.0 / i).toLong)
    val r = run(vs, k = 100)
    val alpha = r.getDouble(5)
    assert(math.abs(alpha - 1.0) < 0.15, s"alpha $alpha should be ~1")
    // a light (uniform) tail scores a much larger alpha
    val uni = run((1L to 2000L).toSeq, k = 100)
    assert(uni.getDouble(5) > 5.0,
      s"uniform tail alpha ${uni.getDouble(5)} should be large")
  }

  test("threshold is the exact (n-k)-th order statistic; ties excluded") {
    // values 1..9 plus three copies of 10; n=12, k=3 -> t = 9th smallest
    val vs = (1L to 9L) ++ Seq(10L, 10L, 10L)
    val r = run(vs, k = 3)
    assert(r.getLong(2) === 9L)
    assert(r.getLong(3) === 3L) // the three 10s
    // all three terms equal round(1e6 ln(10/9))
    val term = math.round(1e6 * math.log(10.0 / 9.0))
    assert(r.getDouble(4) === term * 3 / (1e6 * 3))
  }

  test("ties AT the threshold shrink m below k") {
    // 1..5 then four 6s; k=4 -> t = 5th smallest = 5? n=9, n-k=5 -> t=5
    val vs = (1L to 5L) ++ Seq(6L, 6L, 6L, 6L)
    val r = run(vs, k = 4)
    assert(r.getLong(2) === 5L && r.getLong(3) === 4L)
    // but k=2 -> t = 7th smallest = 6; only values > 6: none -> m=0
    val r2 = run(vs, k = 2)
    assert(r2.getLong(2) === 6L && r2.getLong(3) === 0L)
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("non-positive values are excluded before counting") {
    val r = run(Seq(-5L, 0L, 1L, 2L, 4L, 8L), k = 2)
    assert(r.getLong(0) === 4L)
  }
}

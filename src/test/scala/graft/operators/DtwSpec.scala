package graft.operators

import graft.SparkSpec
import graft.functions.DtwDistance
import org.apache.spark.sql.functions._

class DtwSpec extends SparkSpec {

  import spark.implicits._

  private def dist(a: Seq[Long], b: Seq[Long], band: Int): Option[Long] = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(DtwDistance.dtwDistance(col("a"), col("b"), lit(band)))
      .head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("identical series have distance zero; shifts warp cheaply") {
    val s = Seq(1L, 5L, 25L, 5L, 1L)
    assert(dist(s, s, 5) === Some(0L))
    // one-step lag: DTW warps around the peak; Euclidean would pay 2x24
    val lag = Seq(1L, 1L, 5L, 25L, 5L)
    val d = dist(s, lag, 5).get
    val euclid = s.zip(lag).map { case (x, y) => math.abs(x - y) }.sum
    assert(d < euclid, s"dtw $d must beat pointwise $euclid")
  }

  test("hand-computed 2x2 DP") {
    // xs=[0,10], ys=[0,0]: D11=0, D12=0, D21=10+0, D22=10+min(0,0,10)
    assert(dist(Seq(0L, 10L), Seq(0L, 0L), 2) === Some(10L))
    // xs=[3], ys=[1,2]: path (1,1)->(1,2): |3-1| + |3-2| = 3
    assert(dist(Seq(3L), Seq(1L, 2L), 1) === Some(3L))
  }

  test("band infeasibility and tightening") {
    // length gap 3 > band 1: no path
    assert(dist(Seq(1L, 1L, 1L, 1L), Seq(1L), 1) === None)
    // tight band forces the diagonal: distance becomes pointwise
    val a = Seq(0L, 0L, 9L, 0L)
    val b = Seq(0L, 9L, 0L, 0L)
    val loose = dist(a, b, 3).get
    val tight = dist(a, b, 0).get
    assert(tight === 18L, "band 0 = pure Euclidean path")
    assert(loose < tight)
  }

  test("operator densifies onto the reference grid and zeros gaps") {
    // group "a" matches ref exactly; group "c" misses bucket 2
    val df = Seq(("a", 1L, 4L), ("a", 2L, 6L), ("a", 3L, 2L),
      ("c", 1L, 4L), ("c", 3L, 2L)).toDF("g", "b", "v")
    val ref = Seq((1L, 4L), (2L, 6L), (3L, 2L)).toDF("b", "v")
    val out = Dtw.toReference(df, col("g"), col("b"), col("v"),
        ref, col("b"), col("v"), band = 2)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out("a") === ((3, 0L)))
    // c's series is [4,0,2]: DP vs [4,6,2] -> warp: 0 + min path
    assert(out("c")._1 === 3)
    assert(out("c")._2 > 0L)
  }
}

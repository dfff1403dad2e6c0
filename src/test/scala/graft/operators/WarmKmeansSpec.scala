package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarmKmeansSpec extends SparkSpec {

  import spark.implicits._

  test("one refresh round computes exact micro means per cluster") {
    // two tight groups around (0,0) and (10,10)
    val df = Seq(
      (1L, Seq(0.0, 0.2)), (2L, Seq(0.2, 0.0)),
      (3L, Seq(10.0, 10.2)), (4L, Seq(10.2, 10.0)))
      .toDF("vec_id", "embedding")
    val init = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val out = Clustering.refineCentroids(df, init, rounds = 1)
      .collect().map(r =>
        (r.getInt(1), r.getInt(2)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out((0, 0)) === ((100000L, 2L))) // mean(0, 0.2) = 0.1
    assert(out((0, 1)) === ((100000L, 2L)))
    assert(out((1, 0)) === ((10100000L, 2L)))
    assert(out((1, 1)) === ((10100000L, 2L)))
  }

  test("empty clusters snap to their previous micro grid and keep n=0") {
    val df = Seq((1L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    val init = Array(Array(0.0, 0.0), Array(5.0000004, -5.0000004))
    val out = Clustering.refineCentroids(df, init, rounds = 1)
      .collect().map(r =>
        (r.getInt(1), r.getInt(2)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out((1, 0)) === ((5000000L, 0L))) // snapped, not carried raw
    assert(out((1, 1)) === ((-5000000L, 0L)))
  }

  test("a fixed point stays fixed across rounds") {
    val df = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0)),
      (3L, Seq(8.0, 9.0))).toDF("vec_id", "embedding")
    val init = Array(Array(1.0, 2.0), Array(8.0, 9.0))
    val out = Clustering.refineCentroids(df, init, rounds = 3).collect()
    out.foreach { r =>
      val expect = (r.getInt(1), r.getInt(2)) match {
        case (0, 0) => 1000000L
        case (0, 1) => 2000000L
        case (1, 0) => 8000000L
        case (1, 1) => 9000000L
      }
      assert(r.getLong(3) === expect, s"round ${r.getInt(0)} drifted")
    }
  }

  test("negative exact halves round away from zero (SQL semantics)") {
    assert(Clustering.roundHalfAway(-1.5) === -2L)
    assert(Clustering.roundHalfAway(1.5) === 2L)
    assert(Clustering.roundHalfAway(-0.4) === 0L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOutlierSpec extends SparkSpec {

  import spark.implicits._

  test("a planted far vector is flagged; the tight cluster is not") {
    // 7 coincident vectors at the centroid (MAD 0), one at (50,50)
    val rows = (0 until 7).map(i =>
      (i.toLong, Seq(0.0, 0.0))) :+ (99L, Seq(50.0, 50.0))
    val df = rows.toDF("vec_id", "embedding")
    val out = Clustering.embeddingOutliers(df, Array(Array(0.0, 0.0)))
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(99L))
  }

  test("zero MAD flags everything strictly off the median") {
    // identical distances → MAD 0 → only exact-median rows survive
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.0, 2.0)))
      .toDF("vec_id", "embedding")
    val out = Clustering.embeddingOutliers(df, Array(Array(0.0, 0.0)))
      .collect().map(_.getLong(0)).toSet
    // d² = 1,1,1,4 → med 1, devs 0,0,0,3 → MAD 0 → flag vec 4 only
    assert(out === Set(4L))
  }

  test("medians are computed per cluster") {
    val df = Seq(
      (1L, Seq(0.0, 0.1)), (2L, Seq(0.0, -0.1)), (3L, Seq(0.0, 3.0)),
      (4L, Seq(10.0, 0.1)), (5L, Seq(10.0, -0.1)), (6L, Seq(10.0, 3.0)))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val out = Clustering.embeddingOutliers(df, cents).collect()
    assert(out.map(_.getLong(0)).toSet === Set(3L, 6L))
    assert(out.map(_.getInt(1)).toSet === Set(0, 1))
  }
}

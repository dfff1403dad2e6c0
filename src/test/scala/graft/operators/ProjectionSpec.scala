package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, -1.0f, 0.5f)),
    (2L, Array(0.25f, -0.5f, 0.75f, -1.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("projected coordinates equal the driver-side integer computation") {
    val signs = Projection.signMatrix(7L, 3, 4)
    val out = Projection.projectSigns(vecs, outDim = 3, inDim = 4, seed = 7L)
      .select("vec_id", "proj_micro")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val input = Map(
      1L -> Array(1.0f, 0.0f, -1.0f, 0.5f),
      2L -> Array(0.25f, -0.5f, 0.75f, -1.0f),
      3L -> Array(0.0f, 0.0f, 0.0f, 0.0f))
    for ((id, v) <- input; j <- 0 until 3) {
      val expected = (0 until 4).map(i =>
        signs(j)(i) * math.round(v(i).toDouble * 1e6)).sum
      assert(out(id)(j) == expected,
        s"vec $id coord $j: got ${out(id)(j)}, expected $expected")
    }
  }

  test("projection is seed-deterministic and seed-sensitive") {
    val a = Projection.projectSigns(vecs, 3, 4, seed = 7L)
      .select("proj_micro").collect().map(_.getSeq[Long](0)).toSeq
    val b = Projection.projectSigns(vecs, 3, 4, seed = 7L)
      .select("proj_micro").collect().map(_.getSeq[Long](0)).toSeq
    assert(a == b)
    val c = Projection.projectSigns(vecs, 3, 4, seed = 8L)
      .select("proj_micro").collect().map(_.getSeq[Long](0)).toSeq
    assert(a != c, "a different seed must draw a different sign matrix")
  }

  test("sign matrix is balanced enough to be a real draw") {
    val m = Projection.signMatrix(42L, 16, 64)
    val plus = m.flatten.count(_ == 1)
    // 1024 Bernoulli(1/2) draws: 6σ ≈ 96
    assert(math.abs(plus - 512) < 150, s"suspicious sign balance: $plus/1024")
  }

  test("wrong-dimension vectors are dropped, not silently truncated") {
    val mixed = vecs.unionByName(
      Seq((9L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    val ids = Projection.projectSigns(mixed, 3, 4, seed = 7L)
      .select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
  }

  test("projectedTopK excludes self and honors the ranking contract") {
    val corpus = (1L to 20L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Projection.projectedTopK(corpus,
      corpus.where($"vec_id" === 1L), k = 5, outDim = 4, inDim = 8, seed = 7L)
      .collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(1) != 1L), "self must be excluded")
    assert(out.map(_.getInt(3)).toSeq == (1 to 5), "ranks contiguous from 1")
  }
}

package graft.operators

import graft.SparkSpec

class CoresetSpec extends SparkSpec {

  import spark.implicits._

  // three tight clusters far apart + ids chosen so the seed (min id) is
  // in cluster A; farthest-first must visit each cluster before
  // revisiting any.
  private def clustered = {
    def v(base: Float, jitter: Float) =
      Array.fill(8)(base).zipWithIndex.map { case (x, i) =>
        x + (if (i == 0) jitter else 0f)
      }
    Seq(
      (1L, v(0f, 0.0f), 0), (2L, v(0f, 0.1f), 0),
      (10L, v(10f, 0.0f), 1), (11L, v(10f, 0.1f), 1),
      (20L, v(-10f, 0.0f), 2), (21L, v(-10f, 0.1f), 2)
    ).toDF("vec_id", "embedding", "label")
  }

  test("visits every far cluster before densifying any") {
    val picks = Coreset.kCenters(clustered, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(picks.head._2 === 1L, "seed = min vec_id")
    val clustersOf = Map(1L -> 0, 2L -> 0, 10L -> 1, 11L -> 1, 20L -> 2, 21L -> 2)
    assert(picks.map(p => clustersOf(p._2)).toSet.size === 3,
      s"3 picks must cover 3 clusters: ${picks.mkString(",")}")
  }

  test("d2_sel is non-increasing after the seed and picks are distinct") {
    val ds = Coreset.kCenters(clustered, k = 6).orderBy("rank").collect()
    val ids = ds.map(_.getLong(1))
    assert(ids.distinct.length === ids.length)
    val sels = ds.drop(1).map(_.getLong(2))
    assert(sels.zip(sels.tail).forall { case (a, b) => a >= b },
      s"farthest-first distances must not increase: ${sels.mkString(",")}")
  }

  test("matches a scala brute-force farthest-first on the int8 grid") {
    val df = clustered
    val q = Quantize.int8(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2).toArray).sortBy(_._1)
    def d2(a: Array[Int], b: Array[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    var selected = Vector(q.head._1)
    var dmin = q.map { case (id, v) => id -> d2(v, q.head._2) }.toMap
    val vecs = q.toMap
    for (_ <- 2 to 4) {
      val next = dmin.toSeq.maxBy { case (id, d) => (d, -id) }._1
      selected :+= next
      dmin = dmin.map { case (id, d) => id -> math.min(d, d2(vecs(id), vecs(next))) }
    }
    val got = Coreset.kCenters(df, k = 4).orderBy("rank")
      .collect().map(_.getLong(1)).toVector
    assert(got === selected)
  }

  test("k = 1 returns just the seed") {
    val out = Coreset.kCenters(clustered, k = 1).collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L &&
      out.head.getLong(2) === 0L)
  }
}

package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
                   maxRounds: Int = 24): Map[Long, Long] =
    KCore.kCore(edges.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 with a pendant: 3-core is exactly the K4") {
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val got = core(k4 :+ (4L, 5L), k = 3)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("peel cascade: a chain hanging off a triangle peels link by link") {
    // triangle {1,2,3} + chain 3-4-5-6: 2-core drops 6, then 5, then 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = core(edges, k = 2)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_ == 2L))
  }

  test("k above max degree yields the empty core") {
    assert(core(Seq((1L, 2L), (2L, 3L)), k = 5).isEmpty)
  }

  test("already-a-core graph converges immediately") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = core(ring, k = 2, maxRounds = 3)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("insufficient round budget fails loudly, not silently") {
    // chain of 6 needs ~4 peel rounds at k=2; budget 2 must throw
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    intercept[IllegalArgumentException] { core(edges, k = 2, maxRounds = 2) }
  }
}

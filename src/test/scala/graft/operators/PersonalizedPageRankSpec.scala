package graft.operators

import graft.SparkSpec

class PersonalizedPageRankSpec extends SparkSpec {

  import spark.implicits._

  test("teleport mass lands only on seeds; non-seed sinks hold walk mass only") {
    // chain 1 → 2 → 3, seed {1}: node 1 gets base each round, 2 gets
    // d·pr(1), 3 gets d·pr(2); after round 1: pr(1)=150000,
    // pr(2)=round(0.85·1e6)=850000, pr(3)=850000 (from pr0(2)=0 → 0;
    // wait pr0 = 1e6 on seed only, so r1: pr(2)=850000, pr(3)=0
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r1 = PageRank.personalized(edges, seeds, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) == 150000L)
    assert(r1(2L) == 850000L)
    assert(r1(3L) == 0L)
    val r2 = PageRank.personalized(edges, seeds, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(1L) == 150000L)
    assert(r2(2L) == 127500L) // 0.85 · 150000
    assert(r2(3L) == 722500L) // 0.85 · 850000
  }

  test("rank localizes around the seed component") {
    // two disconnected triangles; seeding one leaves the other at 0
    val t1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val t2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val got = PageRank.personalized((t1 ++ t2).toDF("src", "dst"),
        Seq(1L).toDF("node"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L).forall(got(_) == 0L))
    assert(Seq(1L, 2L, 3L).forall(got(_) > 0L))
  }

  test("seed set = all nodes ≈ global pagerank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val all = Seq(1L, 2L, 3L).toDF("node")
    val ppr = PageRank.personalized(edges, all, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = PageRank.pageRank(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  test("empty seed set rejected") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.personalized(edges, Seq.empty[Long].toDF("node"), iterations = 1)
    }
  }
}

package graft.operators

import graft.SparkSpec

class AnchorTextSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    (1L, 100L, "Big Spark engine"),
    (2L, 100L, "spark cluster"),
    (3L, 100L, "slow engine"),
    (1L, 200L, "other page")
  ).toDF("src", "dst", "anchor")

  // src 2 carries 10x the rank of src 1 and 3
  private val ranks = Seq((1L, 1000L), (2L, 10000L), (3L, 1000L))
    .toDF("node", "pr_micro")

  test("terms weighted by linker rank, ranked (weight desc, term asc)") {
    val out = AnchorText.topTerms(edges, ranks, k = 10)
      .where($"dst" === 100L)
      .select("term", "n_links", "weight_micro", "rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4).toSeq
    // spark: links from 1 (1000) and 2 (10000) = 11000; engine: 1+3 = 2000
    assert(out.head == (("spark", 2L, 11000L, 1)),
      s"high-rank linker dominates: $out")
    // spark 11000 > cluster 10000 > engine 2000 > big 1000 = slow 1000
    // (big/slow tie broken term-asc); "Big" case-folds to "big"
    assert(out.map(_._1) == Seq("spark", "cluster", "engine", "big", "slow"),
      s"unexpected order: $out")
    val engine = out.find(_._1 == "engine").get
    assert(engine._2 == 2L && engine._3 == 2000L)
  }

  test("k caps per-target terms; other targets unaffected") {
    val out = AnchorText.topTerms(edges, ranks, k = 1)
      .select("dst", "term").as[(Long, String)].collect().toSet
    assert(out == Set((100L, "spark"), (200L, "other")))
  }

  test("linkers without a rank row contribute nothing") {
    val sparse = Seq((9L, 100L, "ghost term")).toDF("src", "dst", "anchor")
    assert(AnchorText.topTerms(sparse, ranks, k = 5).count() == 0,
      "inner rank join drops unranked linkers")
  }
}

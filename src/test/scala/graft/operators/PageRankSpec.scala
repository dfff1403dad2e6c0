package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  test("weighted: unit weights reduce exactly to unweighted PageRank") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val un = PageRank.pageRank(e, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w1 = PageRank.pageRankWeighted(
        e.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
        iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(un == w1)
  }

  test("weighted: mass follows the heavy edge") {
    import spark.implicits._
    // 1 → 2 (w 9) and 1 → 3 (w 1): node 2 must end far above node 3
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.pageRankWeighted(e, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) > got(3L) * 3, s"heavy edge must dominate: $got")
  }
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one hand-computed round on a 3-node chain") {
    // 1→2, 2→3, 3→1: out-degree 1 everywhere, N=3
    val init = math.round(1e6 / 3)                         // 333333
    val base = math.round(0.15000000000000002 * 1e6 / 3)   // 50000
    val c = math.round(0.85 * init / 1)
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 1)
    assert(got == Map(1L -> (base + c), 2L -> (base + c), 3L -> (base + c)),
      s"got $got, expected uniform ${base + c}")
  }

  test("a ring stays uniform; a star concentrates rank on the center") {
    val ring = ranks((1L to 6L).map(i => i -> (i % 6 + 1)), iters = 10)
    assert(ring.values.toSet.size == 1, s"ring must stay uniform: $ring")
    val star = ranks((2L to 7L).map(i => i -> 1L) :+ (1L -> 2L), iters = 10)
    val center = star(1L)
    // node 2 receives the center's ENTIRE outflow, so it rivals the
    // center; the pure leaves 3..7 must sit far below both
    assert((3L to 7L).forall(i => star(i) < center),
      s"center must dominate the leaves: $star")
    assert(star(2L) > star(3L), "the center's sole target outranks leaves")
  }

  test("dangling nodes leak mass: total stays below 1e6") {
    // 1→2, 2 dangles
    val got = ranks(Seq((1L, 2L)), iters = 5)
    assert(got.values.sum < 1000000L, s"dangling mass must leak: $got")
    assert(got(2L) > got(1L), "the sink still accumulates from its source")
  }

  test("self-loops are legal and feed their own node") {
    val got = ranks(Seq((1L, 1L), (2L, 1L)), iters = 3)
    assert(got(1L) > got(2L), s"self-looping sink must dominate: $got")
  }
}

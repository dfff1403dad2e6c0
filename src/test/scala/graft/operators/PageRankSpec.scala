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

  test("warm start: k cold + m warm rounds equal k+m cold rounds") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val day1 = PageRank.pageRank(e, iterations = 4)
      .select(col("node"), col("pr_micro"))
    val warm = PageRank.pageRank(e, iterations = 3, initRanks = Some(day1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = PageRank.pageRank(e, iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm === cold)
  }

  test("warm start: new nodes in the delta seed at uniform, vanished ones drop") {
    import spark.implicits._
    val day1Graph = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val day1 = PageRank.pageRank(day1Graph, iterations = 3)
      .select(col("node"), col("pr_micro"))
    // day 2: node 3 appears, nothing vanishes
    val day2Graph = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val warm = PageRank.pageRank(day2Graph, iterations = 2,
        initRanks = Some(day1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm.keySet === Set(1L, 2L, 3L))
    assert(warm(3L) > 0L)
    assert(warm(1L) > warm(3L), "the linked-to node must outrank the leaf")
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

  test("redistributeDangling conserves rank mass to rounding") {
    import spark.implicits._
    // star into a dangling sink + a side chain: heavy dangling mass
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (1L, 2L), (5L, 6L))
      .toDF("src", "dst")
    val iters = 8
    val got = PageRank.pageRank(e, iterations = iters,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = got.size
    val total = got.values.sum
    // per round each node's value carries ≤1 micro of rounding (base +
    // share + per-edge terms), so total drift is bounded by ~3·N·iters
    val bound = 3L * n * iters
    assert(math.abs(total - 1000000L) <= bound,
      s"mass not conserved: total=$total (bound ±$bound)")
    // and WITHOUT the flag the same graph leaks far more than the bound
    val leaky = PageRank.pageRank(e, iterations = iters)
      .collect().map(_.getLong(1)).sum
    assert(1000000L - leaky > 10L * bound,
      s"fixture must leak without the flag: $leaky")
    // the dangling sink still ranks highest (it receives the star)
    assert(got(9L) === got.values.max)
  }
}

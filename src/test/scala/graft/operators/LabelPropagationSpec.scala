package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.propagate(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge edge converge to two communities") {
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val got = labelsOf(cliqueA ++ cliqueB ++ Seq((3L, 10L)), iters = 5)
    // each clique settles on ONE label, and the two differ
    val la = (0L to 3L).map(got).toSet
    val lb = (10L to 13L).map(got).toSet
    assert(la.size == 1, s"clique A split: $got")
    assert(lb.size == 1, s"clique B split: $got")
    assert(la != lb)
  }

  test("star: round 1 ties keep leaf labels (self-vote), hub converges all by round 2") {
    // leaf i ballots {i(self), 5} → tie → keeps i; hub ballots
    // {5, 1, 2, 3} → tie → 1
    val r1 = labelsOf(Seq((5L, 1L), (5L, 2L), (5L, 3L)), iters = 1)
    assert(r1 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 5L -> 1L))
    // round 2: every leaf ballots {own, 1} → tie → 1; hub {1(self),1,2,3} → 1
    val r2 = labelsOf(Seq((5L, 1L), (5L, 2L), (5L, 3L)), iters = 2)
    assert(r2.values.toSet == Set(1L))
  }

  test("deterministic tie-break: triangle collapses to min id in one round") {
    // every node's ballots are all three labels, tie → min → 1
    val r1 = labelsOf(Seq((1L, 2L), (2L, 3L), (1L, 3L)), iters = 1)
    assert(r1.values.toSet == Set(1L))
  }

  test("connected pair converges (no synchronous 2-cycle) thanks to self-vote") {
    // neighbor-only voting would swap 2↔3 forever; with the self-vote
    // both ballots tie {2, 3} → min → 2, stable from round 1
    for (it <- 1 to 4)
      assert(labelsOf(Seq((2L, 3L)), iters = it) == Map(2L -> 2L, 3L -> 2L),
        s"iteration $it")
  }

  test("self-loops don't double-vote; self-loop-only nodes stay singleton") {
    val got = labelsOf(Seq((1L, 1L), (2L, 3L)), iters = 3)
    assert(got(1L) == 1L)
    assert(got(2L) == 2L && got(3L) == 2L)
  }

  test("symmetrization: direction of input edges is irrelevant") {
    val a = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)), iters = 4)
    val b = labelsOf(Seq((2L, 1L), (3L, 2L), (4L, 3L)), iters = 4)
    assert(a == b)
  }

  test("communities roll-up") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "label")
    val got = LabelPropagation.communities(labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (3L, 1L, 3L)))
  }
}

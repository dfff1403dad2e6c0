package graft.operators

import graft.SparkSpec

class SccSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.assign(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two directed cycles joined by a ONE-WAY edge do not merge") {
    // the defining directed test: a spam ring pointing at another ring
    val got = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // ring A
      (4L, 5L), (5L, 6L), (6L, 4L), // ring B
      (3L, 4L)))                    // one-way bridge A -> B
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("a BIDIRECTIONAL bridge does merge the cycles") {
    val got = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L), (4L, 3L)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("a pure path is all singletons (trim, no propagation rounds)") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == (1L to 5L).map(i => i -> i).toMap)
  }

  test("figure-eight: two cycles sharing a node are one SCC") {
    val got = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 3L)))
    assert(got == (1L to 5L).map(i => i -> 1L).toMap)
  }

  test("self-loops and isolated-by-direction nodes are singleton SCCs") {
    val got = run(Seq((7L, 7L), (1L, 2L), (2L, 1L), (2L, 9L)))
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L, 9L -> 9L))
  }

  test("chained colors: downstream cycle peels in a later round") {
    // ring {1,2} -> ring {3,4} -> ring {5,6}: forward coloring floods
    // color 1 over everything, so rings peel one per round — exercises
    // the multi-peel path end-to-end
    val got = run(Seq(
      (1L, 2L), (2L, 1L),
      (3L, 4L), (4L, 3L),
      (5L, 6L), (6L, 5L),
      (2L, 3L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L))
  }

  test("duplicate edges and long-cycle mix") {
    val cycle = (0L until 8L).map(i => (i, (i + 1) % 8))
    val got = run(cycle ++ cycle ++ Seq((3L, 20L)))
    assert(got == ((0L until 8L).map(i => i -> 0L) :+ (20L -> 20L)).toMap)
  }

  test("incremental ≡ cold; a batch edge closing a cycle between old SCCs merges them") {
    // old: 2-cycle {1,2}, 2-cycle {10,11}, one-way DAG edge 2→10
    val oldE = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L), (2L, 10L))
    val prev = Scc.assign(oldE.toDF("src", "dst")).localCheckpoint()
    assert(prev.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    val cond = Scc.condensation(oldE.toDF("src", "dst"), prev)
    // the persisted DAG skeleton is exactly the contracted one-way edge
    assert(cond.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 10L)))
    // batch: 11→1 closes the cycle through the old DAG edge (the two
    // old SCCs MUST merge — the case a contraction without the
    // condensation edges would get wrong), plus a one-way edge from a
    // brand-new node (stays singleton)
    val batch = Seq((11L, 1L), (50L, 10L))
    val inc = Scc.incremental(prev, cond, batch.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = run(oldE ++ batch)
    assert(inc === cold, s"incremental diverged from cold:\n$inc\nvs\n$cold")
    assert(inc === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 50L -> 50L))
  }

  test("incremental: a batch edge that does NOT close a cycle merges nothing") {
    val oldE = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val prev = Scc.assign(oldE.toDF("src", "dst")).localCheckpoint()
    val cond = Scc.condensation(oldE.toDF("src", "dst"), prev)
    val inc = Scc.incremental(prev, cond, Seq((1L, 10L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}

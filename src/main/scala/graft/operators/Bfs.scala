package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance over a directed edge list — the crawl
  * analytics primitive the graph family lacked: "how many link hops is
  * this page from a trusted seed set" is the standard crawl-frontier
  * depth / TrustRank-style distance filter (pages beyond depth d from
  * any seed are overwhelmingly spam or junk; the depth column also
  * feeds curriculum ordering and freshness scheduling). Distinct from
  * [[PageRank.personalized]] (probability mass, not hops) and
  * [[ConnectedComponents]]/[[Scc]] (membership, not distance).
  *
  * Algorithm: classic frontier-expansion BFS at DataFrame grain. Round
  * r joins the CURRENT FRONTIER (nodes first reached at distance r)
  * against the edge list, anti-joins the visited set, and the
  * survivors become frontier r+1. First arrival is shortest arrival —
  * the invariant every textbook BFS rests on — so no re-relaxation and
  * no min-fold over rounds is ever needed.
  *
  * Why one-hop rounds and not the pointer-doubling used in
  * [[Scc]]/[[ConnectedComponents]]: doubling composes LABEL maps
  * (idempotent min), but composing DISTANCE maps is a min-plus product
  * whose intermediate (u, v, d) frame is the transitive closure —
  * quadratic in reachable pairs, exactly what a 100 TB graph cannot
  * materialize. Hop-bounded scans want O(maxHops) cheap rounds; crawl
  * depth caps are small by design (a page 30 hops from every seed is
  * not worth fetching), and `maxHops` is a first-class argument, not a
  * safety valve.
  *
  * 100 TB shape: per-round work is ONE equi-join frontier⋈edges plus
  * one left_anti against visited — all frames hash-partitioned on the
  * node id so the join and the anti-join reuse one partitioning; the
  * shuffle per round carries the frontier's out-edges only (frontiers
  * are a vanishing fraction of |E| on power-law crawl graphs after the
  * first hops). Visited grows monotonically but stays (node, dist)
  * grain — never edges, never paths. Driver traffic is one count per
  * round (the empty-frontier stop signal). Per-round results are
  * lazily checkpointed to truncate iterative lineage, the
  * [[Scc]]/[[ConnectedComponents]] idiom.
  */
object Bfs {

  /** (node, dist) for every node within `maxHops` directed hops of any
    * seed; dist = fewest hops from the nearest seed (seeds themselves
    * are dist 0). Nodes not reached within `maxHops` are absent —
    * filtering semantics, matching the crawl-depth use.
    *
    * @param seeds one column of node ids (duplicates tolerated).
    * @param reliable same contract as [[ConnectedComponents.assign]]:
    *          false uses `localCheckpoint` (fast, executor loss fails
    *          the job); true checkpoints each round to the session's
    *          checkpoint directory.
    */
  def distances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                srcCol: String = "src", dstCol: String = "dst",
                reliable: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    require(!reliable ||
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "Bfs.distances(reliable = true) needs a checkpoint directory: " +
        "call spark.sparkContext.setCheckpointDir(<path>) first")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(false) else df.localCheckpoint(false)
    val sc = seeds.columns.head
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    var frontier = ckpt(seeds
      .select(col(sc).cast("long").as("node"))
      .where(col("node").isNotNull)
      .distinct()
      .withColumn("dist", lit(0L)))
    var visited = frontier
    var hop = 0
    var frontierRows = frontier.count()
    while (hop < maxHops && frontierRows > 0L) {
      hop += 1
      val next = ckpt(frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop.toLong)))
      frontierRows = next.count()
      if (frontierRows > 0L) {
        // keep the union shallow: visited is re-checkpointed so its
        // plan stays 2 frames deep regardless of round count
        visited = ckpt(visited.unionByName(next))
        frontier = next
      }
    }
    visited
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (synchronous peel): repeatedly remove every
  * node with degree < k until the fixed point — the densest-backbone
  * extraction of crawl curation (the k-core of the link graph is the
  * well-connected organic web; pages that survive no core are the
  * periphery a quality prior should distrust). Beyond-reference
  * surface (SURVEY §2.13).
  *
  * The k-core is UNIQUE regardless of peel order/rounds, which is what
  * makes an external oracle possible for a data-dependent loop: the
  * oracle unrolls a fixed round budget and the gate `require`s the
  * Spark side reached the fixed point within it — both land on the
  * same canonical set without coordinating round counts.
  *
  * Per round: one degree census (partial-agg) + two semi-joins
  * filtering the symmetric edge list; convergence check is ONE driver
  * scalar (surviving-node count) per round. Lineage truncated by
  * checkpoint every few rounds like every iterative operator here.
  */
object KCore {

  /** (node, core_degree): nodes of the k-core with their degree inside
    * it. Throws if the peel hasn't converged within `maxRounds` — at
    * 100 TB raise the budget rather than silently returning a
    * non-core (rounds grow with the longest peel chain, not the data
    * size; web graphs converge in tens of rounds).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 24,
            checkpointEvery: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val und = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    var sym = und
      .unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var prev = -1L
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val deg = sym.groupBy("src").agg(count(lit(1)).as("d"))
      // LAZY checkpoint: the count() right below materializes it in the
      // same job (eager paid a second, redundant driver-synced job per
      // peel round); the two semi-joins then read the pinned blocks
      val keep = deg.where(col("d") >= k).select("src").localCheckpoint(false)
      val n = keep.count()
      if (n == prev) converged = true
      else {
        prev = n
        sym = sym
          .join(keep, Seq("src"), "left_semi")
          .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst")
        if (rounds % checkpointEvery == checkpointEvery - 1)
          sym = sym.localCheckpoint()
        rounds += 1
      }
    }
    require(converged,
      s"$k-core peel did not converge within $maxRounds rounds")
    sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .where(col("core_degree") >= k)
  }
}

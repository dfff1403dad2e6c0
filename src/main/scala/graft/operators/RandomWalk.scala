package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation (DeepWalk / node2vec
  * p=q=1, Perozzi et al. 2014): W fixed-length walks from every node,
  * each step choosing a uniform out-edge — the data-prep stage that
  * turns a graph into token sequences for [[SkipGram]]-style embedding
  * training (walks ARE the sentences). The missing bridge between the
  * graph family and the embedding family.
  *
  * Determinism: the step choice is the portable md5 uniform keyed on
  * (seed, start, walk, step) — u64 % outdeg picks the rank-indexed
  * out-edge (edges deduped, ranked by dst, so the index is a total
  * order); any engine replays every walk bit-for-bit, and re-runs are
  * idempotent. A walker reaching a sink (no out-edges) stops — its
  * walk is simply shorter, matching the standard implementation.
  *
  * Scale shape: per step ONE equi-join of the frontier against the
  * (src, idx)-keyed edge table plus a degree join — Pregel-shaped like
  * [[PageRank]], per-round frontier checkpointed (lazy) so the plan
  * stays flat; walk volume is nodes × W × L rows by construction. The
  * per-src rank window is bounded by max out-degree (a per-key window,
  * not a corpus window). Driver sees nothing.
  */
object RandomWalk {

  /** (start, wid, step, node): step 0 is the start node; walks from
    * sinks end early. `edges` is directed (src, dst).
    */
  def walks(edges: DataFrame, walksPerNode: Int, length: Int,
            seed: Long): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1")
    require(length >= 1, s"length must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().localCheckpoint(false)
    val ei = e.withColumn("idx",
      row_number().over(Window.partitionBy("src").orderBy("dst"))
        .cast("long"))
      .select(col("src").as("cur"), col("dst"), col("idx"))
    val deg = e.groupBy(col("src").as("cur"))
      .agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val wids = broadcast((1 to walksPerNode).map(_.toLong).toDF("wid"))
    var frontier = nodes.crossJoin(wids)
      .select(col("node").as("start"), col("wid"),
        col("node").as("cur"))
      .localCheckpoint(false)
    var acc = frontier.select(col("start"), col("wid"),
      lit(0).as("step"), col("cur").as("node"))
    for (t <- 1 to length) {
      val u = conv(substring(md5(concat_ws(":", lit("rw"), lit(seed),
        col("start"), col("wid"), lit(t))), 1, 15), 16, 10).cast("long")
      frontier = frontier
        .join(deg, Seq("cur"))
        .withColumn("idx", lit(1L) + pmod(u, col("deg")))
        .join(ei, Seq("cur", "idx"))
        .select(col("start"), col("wid"), col("dst").as("cur"))
        .localCheckpoint(false)
      acc = acc.unionByName(frontier.select(col("start"), col("wid"),
        lit(t).as("step"), col("cur").as("node")))
    }
    acc
  }
}

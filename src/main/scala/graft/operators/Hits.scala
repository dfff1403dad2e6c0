package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-quantized HITS (Kleinberg hubs & authorities) over an edge
  * list — the second link-graph prior next to [[PageRank]]: authorities
  * rank pages many good hubs point AT (quality targets for a crawl),
  * hubs rank pages that point at many good authorities (seed lists).
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Scores are MICRO units (long, 1.0 ≡ 1e6). Each half-round is an
  * exact integer sum over edges followed by ONE max-normalization with
  * a single double-op chain, rounded back to micro units:
  *   auth'(v) = Σ_{u→v} hub(u);  auth(v) = round(auth'/max(auth')·1e6)
  * (division BEFORE the 1e6 scale so the double stays exact for raw
  * sums < 2⁵³ — per-node in-degree·1e6 < 9·10¹⁵, i.e. in-degree up to
  * ~9·10⁹, comfortably any real graph). Deterministic and
  * association-order-free, so `g_hits` replays every round as unrolled
  * MATERIALIZED CTEs — the [[PageRank]] trick.
  *
  * 100 TB shape: per half-round one partial-aggregated shuffle of edge
  * contributions (keyed dst for auth, src for hub), one node left
  * join, and a 1-row max broadcast — no driver data path. Unlike
  * [[PageRank]], the max-normalization reads its input twice (scores +
  * their max), so each half-round MATERIALIZES the node-sized raw frame
  * (localCheckpoint) rather than recomputing the edge join per
  * reference — one node-table write per half-round instead of a second
  * edge-sized shuffle, and it also truncates lineage (no separate
  * checkpointEvery knob: the normalization already forces the
  * materialization points).
  */
object Hits {

  /** (node, hub_micro, auth_micro) after `iterations` rounds. Nodes
    * with no in-edges hold auth 0; no out-edges, hub 0 (from round 1 —
    * the uniform start is round 0).
    */
  def hits(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()

    def normalized(raw: DataFrame, scoreCol: String): DataFrame = {
      // raw is consumed twice (scores + their max): materialize it once
      // instead of re-running the edge join per reference — this is the
      // per-half-round lineage truncation point
      val r = raw.localCheckpoint()
      val m = r.agg(max(col("raw")).as("m"))
      r.crossJoin(broadcast(m))
        .select(col("node"),
          when(col("m") === 0L, lit(0L))
            .otherwise(round(col("raw").cast("double") / col("m") * lit(1e6))
              .cast("long")).as(scoreCol))
    }

    def halfRound(scores: DataFrame, scoreCol: String, fromCol: String,
                  toCol: String, outCol: String): DataFrame = {
      val contrib = e
        .join(scores.withColumnRenamed("node", fromCol), Seq(fromCol))
        .groupBy(col(toCol).as("node"))
        .agg(sum(col(scoreCol)).as("s"))
      val raw = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("raw"))
      normalized(raw, outCol)
    }

    var hub = nodes.select(col("node"), lit(1000000L).as("hub"))
    var auth = nodes.select(col("node"), lit(1000000L).as("auth"))
    var i = 1
    while (i <= iterations) {
      auth = halfRound(hub, "hub", "src", "dst", "auth")
      hub = halfRound(auth, "auth", "dst", "src", "hub")
      i += 1
    }
    nodes
      .join(hub, "node").join(auth, "node")
      .select(col("node"), col("hub").as("hub_micro"), col("auth").as("auth_micro"))
  }
}

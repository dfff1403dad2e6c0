package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-quantized PageRank over an edge list — the link-graph quality
  * prior of web-corpus curation (crawl frontiers and quality filters
  * both rank by it). Beyond-reference surface (SURVEY §2.13).
  *
  * Ranks are held as MICRO units (long, 1.0 ≡ 1e6):
  *   pr'(v) = round((1−d)·1e6 / N) + Σ_{u→v} round(d · pr(u) / out(u))
  * Exactly ONE double operation chain per edge per round, rounded to an
  * integer before the sum — so every iteration is deterministic integer
  * arithmetic, association-order-free, and the `g_pagerank` oracle
  * replays the ENTIRE loop as unrolled MATERIALIZED CTEs (the
  * [[Bpe]] trick). Quantization error vs float PageRank is < 1e-6 per
  * term per round — irrelevant for ranking, decisive for replayability.
  *
  * DANGLING NODES (no out-edges) leak their mass by default — ranks sum
  * to less than 1; rankings rarely change, so the leak is the cheap
  * default contract. `redistributeDangling = true` adds the classic
  * correction real crawl ranking wants: each round the total dangling
  * mass (one integer partial-agg over the previous ranks, broadcast as
  * a 1-row frame — NO driver traffic) is shared uniformly,
  * round(d·dm/N) micro per node — one more double chain per node per
  * round, same replay contract, and total mass is conserved to within
  * the per-term rounding (±0.5 micro × N × rounds bound, spec-pinned).
  * Self-loops are allowed and contribute to their own node like any
  * edge.
  *
  * 100 TB shape: the Pregel shape without Pregel — per round one
  * partial-aggregated shuffle of edge contributions keyed on dst and
  * one node-table left join; NO driver data path at all (contrast
  * [[Bpe.train]]'s one argmax row per round); `checkpointEvery`
  * truncates lineage so round i costs O(edges), not O(i·edges).
  */
object PageRank {

  /** (node, pr_micro, pr): ranks after `iterations` rounds over
    * `edges` (src, dst).
    */
  /** @param initRanks optional WARM START: yesterday's (node, pr_micro)
    *                   frame — today's run continues from it instead of
    *                   uniform, so a daily-loop refresh needs the few
    *                   rounds the graph DELTA perturbs, not a cold
    *                   convergence. Nodes absent from the init (new
    *                   pages) seed at the uniform 1e6/n; init rows for
    *                   vanished nodes are dropped by the join. Because
    *                   every round is a deterministic pure function of
    *                   the prior state, warmStart(pageRank(k), m) ≡
    *                   pageRank(k+m) exactly — gate-pinned.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
               checkpointEvery: Int = 3,
               initRanks: Option[DataFrame] = None,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    // LOOP-INVARIANT HOISTS (round 8): the node count becomes a literal
    // (one driver fetch; the base-term expression tree keeps the same
    // shape, so constant folding evaluates the SAME Catalyst double
    // chain) — deleting a count aggregate + broadcast + crossJoin from
    // every round's plan; and the out-degree census joins into the edge
    // frame ONCE (out is a pure function of the static edge set), so
    // each round pays one equi-join with the rank frame instead of two.
    val nn = nodes.count()
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("out")), Seq("src"))
      .localCheckpoint()
    // distinct sources for the dangling anti-join, also loop-invariant
    lazy val srcNodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    var pr = initRanks match {
      case None =>
        nodes
          .select(col("node"), round(lit(1e6) / lit(nn)).cast("long").as("pr"))
          .localCheckpoint()
      case Some(init) =>
        nodes
          .join(init.select(col("node"), col("pr_micro").as("_init")),
            Seq("node"), "left_outer")
          .select(col("node"),
            coalesce(col("_init"),
              round(lit(1e6) / lit(nn)).cast("long")).as("pr"))
          .localCheckpoint()
    }
    var i = 1
    while (i <= iterations) {
      val contrib = eo
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          round(lit(damping) * col("pr") / col("out")).cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val base = round(lit(1.0 - damping) * lit(1e6) / lit(nn)).cast("long")
      pr = if (redistributeDangling) {
        // exact integer partial agg of the previous round's dangling
        // mass → 1-row broadcast; the share is ONE double chain,
        // round(d·dm/N), so the oracle replays it verbatim
        val dm = pr
          .join(srcNodes, Seq("node"), "left_anti")
          .agg(coalesce(sum(col("pr")), lit(0L)).as("dm"))
        nodes.join(contrib, Seq("node"), "left_outer")
          .crossJoin(broadcast(dm))
          .select(col("node"),
            (base + round(lit(damping) * col("dm") / lit(nn)).cast("long")
              + coalesce(col("s"), lit(0L))).as("pr"))
      } else {
        nodes.join(contrib, Seq("node"), "left_outer")
          .select(col("node"),
            (base + coalesce(col("s"), lit(0L))).as("pr"))
      }
      if (i % checkpointEvery == 0) pr = pr.localCheckpoint()
      i += 1
    }
    pr.select(col("node"), col("pr").as("pr_micro"),
      round(col("pr").cast("double") / 1e6, 6).as("pr"))
  }

  /** Weighted PageRank: each edge carries a positive integer weight
    * (link multiplicity, anchor quality, crawl frequency) and a node's
    * rank mass splits PROPORTIONALLY to out-edge weights instead of
    * uniformly — the form link-graph curation actually wants (a page
    * linked 50× from one hub is not 50 pages). Same micro-quantization
    * contract: ONE double chain per edge per round,
    * round(d · pr · w / wout), integer everywhere else — replays
    * round-for-round. Weights must be positive integers (weights as
    * doubles would put a float product inside the partial sum and break
    * association-order freedom — quantize upstream).
    */
  def pageRankWeighted(edges: DataFrame, iterations: Int,
                       damping: Double = 0.85,
                       checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    // same loop-invariant hoists as [[pageRank]]: literal node count,
    // out-weight census joined into the edge frame once
    val nn = nodes.count()
    val eo = e.join(e.groupBy("src").agg(sum(col("w")).as("wout")), Seq("src"))
      .localCheckpoint()
    var pr = nodes
      .select(col("node"), round(lit(1e6) / lit(nn)).cast("long").as("pr"))
      .localCheckpoint()
    var i = 1
    while (i <= iterations) {
      val contrib = eo
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          // pr·w as an EXACT long product first — two double ops, not
          // three, so the chain can't ulp-diverge from the oracle
          round(lit(damping) * (col("pr") * col("w")) / col("wout"))
            .cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (round(lit(1.0 - damping) * lit(1e6) / lit(nn)).cast("long")
            + coalesce(col("s"), lit(0L))).as("pr"))
      if (i % checkpointEvery == 0) pr = pr.localCheckpoint()
      i += 1
    }
    pr.select(col("node"), col("pr").as("pr_micro"),
      round(col("pr").cast("double") / 1e6, 6).as("pr"))
  }

  /** Personalized PageRank (random walk with restart): the teleport
    * mass lands ONLY on `seeds` — rank becomes "importance AS SEEN FROM
    * the seed set", the crawl-frontier prioritizer (seeds = trusted
    * hosts) and related-item ranker (seeds = one item) that global
    * PageRank cannot express. Same micro-quantization, same Pregel
    * shape, same dangling-leak contract as [[pageRank]]; the only
    * change is the base term: round((1−d)·1e6/|S|) for seed nodes, 0
    * elsewhere, and the walk starts from the seeds
    * (pr₀ = round(1e6/|S|) on seeds). Seeds ride along as a broadcast
    * flag join (seed sets are small by definition); |S| is a 1-row
    * broadcast like the node count.
    */
  def personalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
                   damping: Double = 0.85,
                   checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val sd = seeds.select(col("node")).distinct()
      .withColumn("_seed", lit(true)).localCheckpoint()
    val flagged = nodes.join(broadcast(sd), Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("_seed"), lit(false)).as("_seed"))
      .localCheckpoint()
    // literal seed count + out-degree joined into the edge frame once —
    // the [[pageRank]] loop-invariant hoists
    val ns = sd.count()
    require(ns >= 1, "personalized PageRank needs >= 1 seed")
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("out")), Seq("src"))
      .localCheckpoint()
    var pr = flagged
      .select(col("node"),
        when(col("_seed"), round(lit(1e6) / lit(ns)).cast("long"))
          .otherwise(lit(0L)).as("pr"))
      .localCheckpoint()
    var i = 1
    while (i <= iterations) {
      val contrib = eo
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          round(lit(damping) * col("pr") / col("out")).cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = flagged.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (when(col("_seed"),
            round(lit(1.0 - damping) * lit(1e6) / lit(ns)).cast("long"))
            .otherwise(lit(0L))
            + coalesce(col("s"), lit(0L))).as("pr"))
      if (i % checkpointEvery == 0) pr = pr.localCheckpoint()
      i += 1
    }
    pr.select(col("node"), col("pr").as("pr_micro"),
      round(col("pr").cast("double") / 1e6, 6).as("pr"))
  }
}

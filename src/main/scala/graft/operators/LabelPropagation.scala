package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (LPA, Raghavan et
  * al. 2007) — the cheap community structure pass of web-corpus curation:
  * site/host clusters for per-community quality priors and sampling caps,
  * next to [[PageRank]] (importance) and [[ConnectedComponents]]
  * (reachability). Beyond-reference surface (SURVEY §2.13).
  *
  * Classic LPA breaks ties randomly and is famously non-reproducible;
  * this variant is DETERMINISTIC by contract: each round every node
  * adopts the most frequent label among its neighbors PLUS its own
  * current label (self-inclusive voting), ties broken by smallest
  * label — integer counts and a total order, so the whole loop replays
  * in an external SQL oracle round-for-round (the [[PageRank]]
  * pattern). Synchronous update (all nodes flip on the round boundary)
  * rather than the sequential-sweep variant: sequential sweeps impose a
  * node visit ORDER, which is exactly what a distributed engine cannot
  * reproduce. The self-vote is load-bearing for the synchronous
  * update: neighbor-only voting 2-cycles forever on bipartite
  * structures (a connected pair swaps labels every round — the known
  * synchronous-LPA oscillation); with the self-vote every oscillation
  * of period 2 becomes a tie that the min-label rule settles.
  *
  * Graph contract: edges are symmetrized (u→v implies v→u) and
  * self-loops are dropped (the self-vote already covers them). Nodes
  * with no non-self edges keep their own label (their self-vote is the
  * only ballot — singleton communities).
  *
  * 100 TB shape: per round ONE partial-aggregated shuffle of neighbor
  * votes keyed on (node, label) plus a node-partitioned argmax window —
  * Pregel-shaped, zero driver data path; `checkpointEvery` truncates
  * lineage like the other iterative operators.
  */
object LabelPropagation {

  /** (node, label) after `iterations` synchronous rounds. */
  def propagate(edges: DataFrame, iterations: Int,
                checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(col("src"), col("dst"))
    // every endpoint is a node (self-loop-only nodes included as
    // singletons); symmetrized loop-free edge set drives the votes
    val nodes = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val und = e0.where(col("src") =!= col("dst"))
    val sym = und
      .unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()

    val w = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label").asc)
    var lab = nodes.select(col("node"), col("node").cast("long").as("label"))
    var i = 1
    while (i <= iterations) {
      // ballots = every neighbor's label + the node's own (self-vote);
      // the self-vote guarantees every node has ≥1 ballot, so the
      // argmax covers all nodes — no keep-old left join needed
      val votes = sym
        .join(lab.select(col("node").as("dst"), col("label")), Seq("dst"))
        .select(col("src").as("node"), col("label"))
        .unionByName(lab)
      lab = votes
        .groupBy("node", "label")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("node"), col("label"))
      if (i % checkpointEvery == 0) lab = lab.localCheckpoint()
      i += 1
    }
    lab
  }

  /** Community roll-up: (label, size, min_node) — the summary grain a
    * per-community sampling cap consumes.
    */
  def communities(labels: DataFrame): DataFrame =
    labels.groupBy("label")
      .agg(count(lit(1)).as("size"), min(col("node")).as("min_node"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation over the link graph — the crawl-curation
  * step that turns inlink anchors into per-target descriptors, weighted
  * by the linking page's [[PageRank]] so spam links with no standing
  * contribute little. Beyond-reference surface (SURVEY §2.13).
  *
  * Weights stay in PageRank's integer micro-units end-to-end: sums of
  * longs are association-order-free, so the whole chain — explode,
  * rank join, per-target top-k — replays exactly in SQL (the same
  * trick that makes the PageRank loop itself oracle-gated).
  *
  * 100 TB shape: anchors explode to term grain (bounded by anchor
  * length × edges, the data's own size), one partial-agg shuffle to
  * (dst, term) grain, and a per-dst top-k window at that grain. The
  * rank join is src-keyed — co-partitioned with the edge list's
  * natural key. Hub pages with millions of inlinks land many (dst,
  * term) census rows, not wide rows; adversarial single-dst skew is
  * the per-group-cap/salting territory of [[Skew]], composable here.
  */
object AnchorText {

  /** Per-target top-k anchor terms: (dst, term, n_links, weight_micro,
    * rank), ranked by PageRank-weighted inlink mass (weight desc, term
    * asc — total order, engine-replayable).
    *
    * @param edges (src, dst, anchor-text) inlinks
    * @param ranks (node, pr_micro) integer micro-unit ranks, e.g.
    *              [[PageRank.pageRank]] output
    */
  def topTerms(edges: DataFrame, ranks: DataFrame, k: Int,
               anchorCol: String = "anchor"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = edges.select(col("src"), col("dst"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(anchorCol))))
          .as("term"))
      .where(col("term") =!= "")
    val census = terms
      .join(ranks.select(col("node").as("src"), col("pr_micro")), "src")
      .groupBy("dst", "term")
      .agg(count(lit(1)).as("n_links"), sum("pr_micro").as("weight_micro"))
    val w = Window.partitionBy("dst")
      .orderBy(col("weight_micro").desc, col("term").asc)
    census.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor / Adamic–Adar link prediction (Liben-Nowell &
  * Kleinberg 2003): score every NON-edge (a, b) by the neighbors they
  * share, weighting each shared neighbor w by 1/ln(deg(w)) — a shared
  * rare neighbor is strong evidence, a shared hub is weak. The missing
  * PREDICTION primitive next to the graph family's descriptive ops
  * (PageRank/HITS importance, LPA/SCC membership, triangles density):
  * "which links should exist" drives crawl frontier priority,
  * related-content candidates, and knowledge-graph completion.
  *
  * Determinism: degrees are exact longs; each pivot weight is
  * round(1e6/ln(deg)) micro-quantized ONCE at the degree census (a
  * single libm log per DISTINCT degree-bearing node, identical in any
  * engine), so pair scores are exact long sums.
  *
  * Scale shape: candidate generation is the wedge fan-out through each
  * common neighbor — quadratic in pivot degree, so `maxDegree` caps
  * which nodes may act as pivots (the [[Decontaminate]] maxDf
  * discipline: a hub above the cap contributes 1/ln(deg) ≈ nothing per
  * pair but d² rows; dropping it is a documented, bounded bias, not a
  * silent skew bomb). Everything else is equi-joins and one partial-agg
  * shuffle at pair grain; existing edges leave via one anti-join.
  * Degree-1 nodes can never be common neighbors, so ln(1) = 0 never
  * divides.
  */
object LinkPrediction {

  /** Scored non-edges: (a, b, cn, aa_micro, aa) with a < b, cn = common
    * neighbor count under the cap, aa_micro the exact micro Adamic–Adar
    * sum and aa its unit value (one exact-integer division).
    */
  def adamicAdar(edges: DataFrame, maxDegree: Long = 65536L): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val und = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    val nbrs = und.select(col("a").as("w"), col("b").as("n"))
      .unionByName(und.select(col("b").as("w"), col("a").as("n")))
    val wts = nbrs.groupBy("w").agg(count(lit(1)).as("degree"))
      .where(col("degree") >= 2 && col("degree") <= maxDegree)
      .withColumn("w_micro",
        round(lit(1e6) / log(col("degree").cast("double"))).cast("long"))
    val nb = nbrs.join(wts, Seq("w"))
    val cand = nb.select(col("w"), col("n").as("a"), col("w_micro"))
      .join(nb.select(col("w"), col("n").as("b")), Seq("w"))
      .where(col("a") < col("b"))
    cand.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("w_micro").as("aa_micro"))
      .join(und, Seq("a", "b"), "left_anti")
      .withColumn("aa", col("aa_micro").cast("double") / lit(1e6))
  }
}

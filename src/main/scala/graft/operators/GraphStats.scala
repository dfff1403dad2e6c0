package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global graph-structure statistics — the summary numbers of a crawl
  * graph's health report, next to the per-node signals ([[PageRank]],
  * [[Triangles]], [[KCore]]). Beyond-reference surface (SURVEY §2.13).
  */
object GraphStats {

  /** Degree assortativity coefficient (Newman 2002): the Pearson
    * correlation of endpoint degrees over the symmetrized edge list.
    * Organic webs are slightly disassortative (hubs link to leaves,
    * r < 0); a link farm of cross-linked hubs shows up as anomalous
    * positive r — a one-number spam smell test.
    *
    * r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) with x, y the endpoint
    * degrees of each directed edge of the symmetric list (Σx = Σy by
    * symmetry, so one set of sums suffices). All sums are EXACT 64-bit
    * integers — association-order-free, so the single output row
    * replays bit-for-bit (exact up to Σd³ < 2⁶³, i.e. any graph whose
    * cube-degree mass fits a long — beyond that, pre-scale degrees;
    * documented, same contract as the PCA census). Degenerate graphs
    * (all degrees equal — zero variance) yield null r.
    *
    * Output: one row (m, s1, s2, sxy, r).
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val sym = und
      .unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
    val scored = sym
      .join(deg.select(col("node").as("src"), col("d").as("dx")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("d").as("dy")), Seq("dst"))
    scored.agg(
        count(lit(1)).as("m"),
        sum(col("dx")).as("s1"),
        sum(col("dx") * col("dx")).as("s2"),
        sum(col("dx") * col("dy")).as("sxy"))
      .withColumn("r", round(
        try_divide(
          (col("m") * col("sxy") - col("s1") * col("s1")).cast("double"),
          (col("m") * col("s2") - col("s1") * col("s1")).cast("double")), 6))
  }
}

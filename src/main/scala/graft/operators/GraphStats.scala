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

  /** Newman modularity of a community assignment — the quality score
    * that closes the community loop: [[LabelPropagation]] proposes the
    * partition, Q says whether it beats chance (Q ≈ 0: no better than
    * random given the degree sequence; 0.3–0.7: real structure —
    * community-capped sampling can trust the labels). Graph contract
    * matches LPA: symmetrized, self-loops dropped, duplicate edges
    * collapse.
    *
    * Q = Σ_c (e_c/m − (d_c/2m)²) over communities, with e_c = edges
    * inside c, d_c = degree mass of c, m = undirected edge count —
    * computed as ONE exact integer numerator Σ_c (4m·e_c − d_c²) in
    * DECIMAL(38,0) (association-order-free) and a single rounded
    * division by 4m². Shapes: canonical-orientation distinct for the
    * edge set, two label joins for e_c (equi-joins on node ids), a
    * degree census for d_c — all census-grain aggregates, no windows.
    * Nodes absent from `labels` count toward m and their endpoints'
    * degrees but join out of e_c/d_c — label every node upstream (LPA
    * labels every endpoint by construction).
    *
    * Output: one row (m, n_communities, q).
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    val und = e0.select(least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v")).distinct()
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label"))
    val m = und.count()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val dC = deg.join(lab, Seq("node"))
      .groupBy("label").agg(sum(col("d")).as("d_c"))
    val eC = und
      .join(lab.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
      .where(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("e_c"))
    dC.join(eC, Seq("label"), "left_outer")
      .na.fill(0L, Seq("e_c"))
      .agg(count(lit(1)).as("n_communities"),
        sum(lit(4L).cast("decimal(38,0)") * lit(m) * col("e_c")
          - col("d_c").cast("decimal(38,0)") * col("d_c")).as("_num"))
      .select(lit(m).as("m"), col("n_communities"),
        when(lit(m) > 0L,
          round(col("_num").cast("double")
            / (4.0d * m.toDouble * m.toDouble), 6)).as("q"))
  }
}

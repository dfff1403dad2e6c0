package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient — the graph-quality
  * signal next to [[PageRank]] (importance) and [[LabelPropagation]]
  * (communities): link farms show near-zero clustering while organic
  * link neighborhoods triangle densely, so the coefficient is a cheap
  * spam prior. Beyond-reference surface (SURVEY §2.13).
  *
  * Algorithm: the degree-ordered node-iterator (Schank & Wagner / the
  * MapReduce classic). Undirected loop-free edges are ORIENTED from the
  * lower endpoint to the higher under the total order (degree, node) —
  * every triangle has exactly one "pivot" node from which both oriented
  * edges leave, so each triangle is generated ONCE, and the pivot is
  * always the LOWEST-degree corner: wedge fanout per node is bounded by
  * its oriented out-degree, which the orientation caps at O(√m) for any
  * graph — the hub that would explode a naive wedge join never pivots.
  * Wedges (u→v, u→w) then probe the oriented edge set for (v, w) via
  * one equi-join.
  *
  * Everything is integer joins/aggregates — fully oracle-replayable.
  */
object Triangles {

  /** Symmetrized, deduplicated, loop-free (src, dst) with src < dst. */
  private def canonical(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
  }

  /** (node, degree, triangles, coeff): per-node triangle count and
    * local clustering coefficient 2T/(d(d−1)) (6dp; null for degree
    * < 2 — a node with no wedge has no defined coefficient).
    */
  def count(edges: DataFrame): DataFrame = {
    val und = canonical(edges).localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("degree"))
      .localCheckpoint()
    // orient by the (degree, node) total order
    val da = deg.select(col("node").as("a"), col("degree").as("_da"))
    val db = deg.select(col("node").as("b"), col("degree").as("_db"))
    val oriented = und.join(da, Seq("a")).join(db, Seq("b"))
      .select(
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // wedges from each pivot: (v, w) pairs of oriented out-neighbors
    val o1 = oriented.select(col("src").as("pivot"), col("dst").as("v"))
    val o2 = oriented.select(col("src").as("pivot"), col("dst").as("w"))
    val wedges = o1.join(o2, Seq("pivot")).where(col("v") < col("w"))
    // closing edge probe: oriented (v,w) in EITHER orientation
    val probe = oriented.select(col("src").as("v"), col("dst").as("w"))
      .unionByName(oriented.select(col("dst").as("v"), col("src").as("w")))
    val tris = wedges.join(probe, Seq("v", "w"))
      .select(col("pivot"), col("v"), col("w"))
    // every triangle credits all three corners
    val perNode = tris.select(explode(array(col("pivot"), col("v"), col("w"))).as("node"))
      .groupBy("node")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff",
        when(col("degree") >= 2,
          round(lit(2.0) * col("triangles") /
            (col("degree") * (col("degree") - 1)), 6)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact quantile binning for integer features — the adaptive
  * discretizer in front of [[DecisionTree]]/[[Boost]]/[[Forest]] when
  * fixed-width bins fail: a long-tailed feature (document length,
  * inlink count) packs most rows into two width-bins and starves the
  * split search; equal-FREQUENCY bins give every threshold candidate
  * real mass. Beyond-reference surface (SURVEY §2.13).
  *
  * Edges are EXACT order statistics: edge_j (j = 1..bins−1) is the
  * smallest value whose cumulative count reaches rank
  * ⌈j·n/bins⌉ = (j·n + bins − 1) div bins — integer arithmetic end to
  * end, so the `v_quantile_bins` oracle derives the same edges from the
  * same census. A row bins to `#edges < x` (a value equal to an edge
  * stays in the lower bin); duplicate edges (possible under heavy
  * skew — one value spanning several ranks) simply leave their bins
  * empty, which the downstream trainers already tolerate.
  *
  * 100 TB shape: ONE value-census shuffle per feature (map-side
  * combine to distinct values), a driver scan of the sorted census
  * (bounded by the feature's distinct-value count — the documented
  * contract; discretize genuinely continuous features upstream or use
  * the KLL sketch surface ([[graft.functions.KllSketch]]) where an
  * approximate edge is acceptable), then binning is a codegen'd
  * when-chain scan — no shuffle.
  */
object QuantileBins {

  /** Per-feature ascending edge lists (bins−1 each, duplicates kept). */
  def fit(df: DataFrame, features: Seq[Column], bins: Int): Seq[Seq[Long]] = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(features.nonEmpty, "need at least one feature")
    features.map { c =>
      val census = df.select(c.cast("long").as("v"))
        .where(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val n = census.map(_._2).sum
      require(n >= 1, "quantile fit needs at least one non-null row")
      val cum = census.scanLeft(0L)(_ + _._2).tail
      (1 until bins).map { j =>
        val rank = (j * n + bins - 1) / bins
        val idx = cum.indexWhere(_ >= rank)
        census(idx)._1
      }
    }
  }

  /** Edge table for the gate surface: (feature, j, edge). */
  def edgesFrame(spark: org.apache.spark.sql.SparkSession,
                 edges: Seq[Seq[Long]]): DataFrame = {
    import spark.implicits._
    edges.zipWithIndex.flatMap { case (es, f) =>
      es.zipWithIndex.map { case (e, j) => (f.toLong, (j + 1).toLong, e) }
    }.toDF("feature", "j", "edge")
  }

  /** Bin column for one feature: `#edges < x` as a codegen when-chain. */
  def binColumn(c: Column, edges: Seq[Long]): Column =
    edges.map(e => when(c.cast("long") > e, 1L).otherwise(0L))
      .reduceOption[Column](_ + _).getOrElse(lit(0L))

  /** Adds `_qb0.._qbN` quantile-bin columns for `features`. The result
    * feeds the binned trainers with the identity spec
    * (col, 0, bins) — [[DecisionTree.binColumn]] is the identity on
    * [0, bins) input.
    */
  def transform(df: DataFrame, features: Seq[Column],
                edges: Seq[Seq[Long]]): DataFrame = {
    require(features.size == edges.size,
      s"${features.size} features vs ${edges.size} edge lists")
    val cols = features.zip(edges).zipWithIndex.map {
      case ((c, es), i) => binColumn(c, es).as(s"_qb$i") }
    df.select(col("*") +: cols: _*)
  }
}

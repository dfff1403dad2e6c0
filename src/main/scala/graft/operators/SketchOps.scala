package graft.operators

import graft.functions.ThetaSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-split set algebra on sketched content-identity sets — the
  * question the HLL dataset card ([[CorpusStats.datasetCardSketch]])
  * cannot answer: how much content do two corpus slices SHARE?
  * Split-leakage matrices (train ∩ eval), day-over-day novelty
  * (today \ yesterday), and crawl-overlap audits all reduce to set-op
  * estimates over per-group theta sketches (
  * [[graft.functions.ThetaSketch]]): one partial-aggregated groupBy
  * builds a ≤ 16·2^lgK-byte sketch per group, and every pairwise
  * overlap then costs O(sketch) on k rows — never a distinct-count
  * join of the corpora. Sketches are compact DataSketches wire bytes:
  * persist them to parquet next to the card and merge tomorrow's
  * without re-reading today's 100 TB.
  *
  * Below ~2^lgK distinct fingerprints per group the sketches are in
  * exact mode and every estimate is an exact integer (what the oracle
  * gate pins); beyond, relative error ~1/√2^lgK (~0.8% at lgK 14).
  */
object SketchOps {

  /** One theta sketch of content fingerprints per group:
    * (grp, n_docs, sketch).
    */
  def groupSketches(docs: DataFrame, groupCol: String = "lang",
                    textCol: String = "text", lgK: Int = 14): DataFrame =
    docs.select(col(groupCol).as("grp"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        ThetaSketch.thetaAgg(col("fp"), lgK).as("sketch"))

  /** Pairwise overlap matrix over the (few) group sketches: for each
    * unordered pair a < b, the cardinality of each side, their
    * intersection, union, difference, and the Jaccard estimate.
    * Estimates round to whole counts (exact in exact mode — a sketch
    * retains every hash until 2^lgK distincts).
    */
  def overlapMatrix(sketches: DataFrame, keyCol: String = "grp",
                    sketchCol: String = "sketch"): DataFrame = {
    val a = sketches.select(col(keyCol).as("a"), col(sketchCol).as("_sa"))
    val b = sketches.select(col(keyCol).as("b"), col(sketchCol).as("_sb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(ThetaSketch.estimate(col("_sa"))).cast("long").as("card_a"),
        round(ThetaSketch.estimate(col("_sb"))).cast("long").as("card_b"),
        round(ThetaSketch.intersectEstimate(col("_sa"), col("_sb")))
          .cast("long").as("card_intersect"),
        round(ThetaSketch.unionEstimate(col("_sa"), col("_sb")))
          .cast("long").as("card_union"),
        round(ThetaSketch.aNotBEstimate(col("_sa"), col("_sb")))
          .cast("long").as("card_a_not_b"))
      .withColumn("jaccard_est",
        round(col("card_intersect").cast("double") / col("card_union"), 6))
  }

  /** Pairwise content Jaccard between corpus slices in ONE call — the
    * train-vs-eval leakage matrix / day-vs-day novelty report:
    * sketch each slice of `groupCol`, then every unordered slice pair's
    * cardinalities, set-op estimates, and Jaccard. k slices cost k
    * sketches + k(k−1)/2 O(sketch) combines — the corpora are scanned
    * exactly once regardless of how many pairs are reported.
    */
  def sliceJaccard(docs: DataFrame, groupCol: String = "lang",
                   textCol: String = "text", lgK: Int = 14): DataFrame =
    overlapMatrix(groupSketches(docs, groupCol, textCol, lgK))
}

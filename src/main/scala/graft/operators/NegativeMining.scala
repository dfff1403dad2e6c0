package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for embedding-model training — for each anchor
  * with a known positive, the top-k most-similar corpus vectors that are
  * NOT the positive and rank strictly below it (semi-hard band: hard
  * enough to carry gradient, not so hard they're unlabeled positives).
  * Beyond-reference surface (SURVEY §2.13); the contrastive-training
  * counterpart of the ANN stack in [[Similarity]].
  *
  * All ranking happens on the 6dp-rounded cosine with the id tiebreak —
  * the same portability contract as [[Similarity.topK]], so the exact
  * path is oracle-replayable and the IVF path is directly comparable
  * for recall.
  *
  * 100 TB shape: the anchor set is the training batch's pair list —
  * small relative to the corpus — and broadcasts; [[semiHard]] is the
  * exact one-pass baseline (corpus × anchors, corpus never shuffled),
  * [[semiHardIvf]] the scale path: corpus bucketed once by nearest
  * coarse centroid, each anchor probing nProbe lists, so scored
  * candidates shrink to ~nProbe/nLists of the corpus exactly as in
  * [[Similarity.ivfTopKWith]].
  */
object NegativeMining {

  /** Attach each anchor's positive similarity: (query_id, _qv, _pv,
    * pos_id, pos_cos6). Pairs and their vectors are batch-sized —
    * broadcast downstream.
    */
  private def anchorsWithPos(corpus: DataFrame, pairs: DataFrame,
                             idCol: String, vecCol: String): DataFrame = {
    val vecs = corpus.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("anchor_id"), col(vecCol).as("_qv")), "anchor_id")
      .join(vecs.select(col(idCol).as("pos_id"), col(vecCol).as("_pv")), "pos_id")
      .select(col("anchor_id").as("query_id"), col("pos_id"), col("_qv"),
        round(Similarity.cosine(col("_qv"), col("_pv")), 6).as("pos_cos6"))
  }

  private def rankBand(cands: DataFrame, k: Int, minCos: Double): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos6").desc, col("neighbor_id").asc)
    cands
      .withColumn("_cos6", round(col("cosine"), 6))
      .where(col("_cos6") < col("pos_cos6") && col("_cos6") >= minCos)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("pos_id"), col("neighbor_id"),
        col("_cos6").as("cosine"), col("pos_cos6"), col("rank"))
  }

  /** Exact semi-hard negatives: every corpus vector except the anchor
    * itself and its positive, cosine strictly below the positive's (at
    * 6dp), optional `minCos` floor to drop trivially-easy negatives.
    * Output (query_id, pos_id, neighbor_id, cosine, pos_cos6, rank).
    */
  def semiHard(corpus: DataFrame, pairs: DataFrame, k: Int,
               minCos: Double = -1.0, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val q = anchorsWithPos(corpus, pairs, idCol, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val cands = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id") &&
        col("neighbor_id") =!= col("pos_id"))
      .withColumn("cosine", Similarity.cosine(col("_cv"), col("_qv")))
    rankBand(cands, k, minCos)
  }

  /** IVF-bucketed semi-hard negatives: corpus assigned once to its
    * nearest coarse centroid, anchors probe their `nProbe` nearest
    * lists — candidates bound to ~nProbe/nLists of the corpus. Same
    * output contract as [[semiHard]]; recall < 1 by design (measured by
    * the recall harness, not assumed).
    */
  def semiHardIvf(corpus: DataFrame, pairs: DataFrame,
                  quantizer: Array[Array[Double]], k: Int, nProbe: Int = 4,
                  minCos: Double = -1.0, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(quantizer.nonEmpty, "empty quantizer")
    val q = anchorsWithPos(corpus, pairs, idCol, vecCol)
      .withColumn("list_id",
        explode(Clustering.probesColumn(col("_qv"), quantizer, nProbe)))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("list_id", Clustering.assignColumn(col("_cv"), quantizer))
    val cands = c.join(broadcast(q), Seq("list_id"))
      .where(col("neighbor_id") =!= col("query_id") &&
        col("neighbor_id") =!= col("pos_id"))
      .withColumn("cosine", Similarity.cosine(col("_cv"), col("_qv")))
    rankBand(cands, k, minCos)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-fold cross-validated evaluation of the hashed-NB classifier — the
  * model-selection primitive the eval family measures AROUND (AUC,
  * calibration, thresholds all score ONE fitted model; CV is how a
  * pipeline picks between models/feature configs without spending the
  * held-out set). Beyond-reference surface (SURVEY §2.13).
  *
  * Folds are PORTABLE md5 draws on the doc id ("cv:<id>" mod k — the
  * split machinery's discipline, so the oracle derives the same folds),
  * label-null docs are excluded (they can train neither class and have
  * no AUC contribution), and per fold the classifier trains on the
  * OTHER k−1 folds ([[Classifier.trainNaiveBayes]] + [[Classifier
  * .classPrior]], the exact integer micro-log-odds pipeline) and scores
  * the held-out fold; one [[Evaluation.rocAucBy]] pass turns the
  * unioned scored folds into per-fold tie-corrected AUCs. Every
  * training census, prior, score sum and the rank-sum AUC replays in
  * SQL — the gate is hash-exact despite "training" happening k times.
  *
  * 100 TB shape: k × (two ≤`buckets`-row training censuses + one
  * doc-grain score shuffle over 1/k of the corpus) + one score-census
  * AUC — everything partial-aggregated, the weight tables broadcast,
  * nothing driver-side. The base frame is localCheckpointed once: it is
  * referenced 3k+1 times below and re-deriving the lineage per fold
  * would multiply the upstream plan k-fold (the pipeline's documented
  * lineage hazard).
  */
object CrossVal {

  def nbCvAuc(docs: DataFrame, label: Column, folds: Int = 5,
              buckets: Int = 1024, textCol: String = "text",
              tag: String = "cv"): DataFrame = {
    require(folds >= 2 && folds <= 20, s"folds must be in [2,20], got $folds")
    val base = docs
      .select(col("doc_id"), col(textCol).as("text"), label.as("label"))
      .where(col("label").isNotNull)
      .withColumn("fold",
        pmod(conv(substring(md5(concat(lit(s"$tag:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(folds.toLong)))
      .localCheckpoint(true)
    val scored = (0 until folds).map { i =>
      val train = base.where(col("fold") =!= i)
      val pos = train.where(col("label"))
      val neg = train.where(!col("label"))
      val test = base.where(col("fold") === i)
      Classifier.score(test,
          Classifier.trainNaiveBayes(pos, neg, buckets),
          Classifier.classPrior(pos, neg), buckets)
        .join(test.select("doc_id", "label"), Seq("doc_id"))
        .withColumn("fold", lit(i.toLong))
    }.reduce(_ unionByName _)
    Evaluation.rocAucBy(scored, col("fold"))
      .select(col("grp").cast("long").as("fold"),
        col("n_pos"), col("n_neg"), col("auc"))
  }
}

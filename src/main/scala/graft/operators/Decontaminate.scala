package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find evaluation documents whose n-gram
  * content is contained in some training document — the standard
  * train/test-overlap check an LLM data pipeline runs before training.
  *
  * Containment(test, train) = |shingles(test) ∩ shingles(train)| /
  * |shingles(test)| — asymmetric by design (a short eval prompt buried in
  * a long training page must still score 1.0, which symmetric Jaccard
  * would dilute to ~0).
  *
  * Physical shape: an inverted-index equi-join on 8-byte shingle digests
  * (one shuffle keyed on the digest), then a per-pair match count — never
  * an all-pairs comparison. The scale hazard is ubiquitous shingles
  * (boilerplate n-grams joining everything to everything); `maxDf` drops
  * shingles occurring in more than that many TRAIN docs before the join —
  * the same stop-shingle cap production dedup pipelines use. Dropping
  * only train-side rows can only lower a containment score, never raise
  * it (documented false-negative trade, no false positives).
  */
object Decontaminate {

  /** Per contaminated test doc: the best-matching train doc, its
    * containment, and how many train docs clear the threshold.
    *
    * @param test  frame with (doc_id, textCol) — the evaluation set
    * @param train frame with (doc_id, textCol) — the training corpus
    * @param threshold minimum containment to count as contamination
    * @param maxDf drop shingles present in more than this many train docs.
    *              The cap is ON by default (100k): without it, one
    *              ubiquitous shingle ("in order to", license boilerplate)
    *              joins a large fraction of the corpus to every test doc
    *              containing it, and the operator degrades to quadratic
    *              before the groupBy can collapse it. 100k is far above
    *              any legitimately-matching shingle's df yet bounds the
    *              worst key's fan-out. Pass `maxDf = 0` to explicitly opt
    *              out (exact containment, unsafe on open-web corpora).
    */
  val DefaultMaxDf: Long = 100000L

  /** (test_id, train_id, containment ≥ threshold) pairs — the shared
    * inverted-index core of [[report]] and [[contaminatedTrainIds]].
    */
  private def scoredPairs(test: DataFrame, train: DataFrame, textCol: String,
                          threshold: Double, shingleSize: Int,
                          maxDf: Long): DataFrame = {
    val testSh = Dedup.shingleRows(test, textCol, shingleSize)
      .select(col("doc_id").as("test_id"), col("g"))
    val trainSh0 = Dedup.shingleRows(train, textCol, shingleSize)
      .select(col("doc_id").as("train_id"), col("g"))
    val trainSh =
      if (maxDf <= 0L) trainSh0
      else {
        val df = trainSh0.groupBy("g")
          .agg(count(lit(1)).as("_df"))
          .where(col("_df") <= maxDf)
          .select("g")
        trainSh0.join(df, Seq("g"), "left_semi")
      }
    val testSizes = testSh.groupBy("test_id").agg(count(lit(1)).as("_n"))
    val matches = testSh.join(trainSh, Seq("g"))
      .groupBy("test_id", "train_id").agg(count(lit(1)).as("_m"))
    matches.join(testSizes, Seq("test_id"))
      .withColumn("containment",
        round(col("_m").cast("double") / col("_n"), 6))
      .where(col("containment") >= threshold)
  }

  def report(test: DataFrame, train: DataFrame, textCol: String = "text",
             threshold: Double = 0.8, shingleSize: Int = 3,
             maxDf: Long = DefaultMaxDf): DataFrame = {
    val scored = scoredPairs(test, train, textCol, threshold, shingleSize, maxDf)
    // best train match per test doc (min train_id tiebreak → deterministic)
    scored.groupBy("test_id")
      .agg(max(struct(col("containment"), (-col("train_id")).as("_neg")))
          .as("_best"),
        count(lit(1)).as("n_contaminating"),
        round(max(col("containment")), 6).as("max_containment"))
      .select(col("test_id"),
        (-col("_best._neg")).cast("long").as("best_train_id"),
        col("max_containment"), col("n_contaminating"))
  }

  /** The DROP set for corpus decontamination: every train doc containing
    * ≥ threshold of ANY test/benchmark doc's shingle set — not just the
    * best match per benchmark that [[report]] surfaces. One `doc_id`
    * column, ready for a left_anti join against the corpus.
    */
  def contaminatedTrainIds(test: DataFrame, train: DataFrame,
                           textCol: String = "text", threshold: Double = 0.8,
                           shingleSize: Int = 3,
                           maxDf: Long = DefaultMaxDf): DataFrame =
    scoredPairs(test, train, textCol, threshold, shingleSize, maxDf)
      .select(col("train_id").as("doc_id")).distinct()
}

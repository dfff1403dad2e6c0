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

  /** Corpus SELF-containment: doc-in-doc quote/excerpt pairs — the
    * asymmetric-overlap dedup tier Jaccard misses (a 16-token excerpt
    * of a 500-token article has tiny Jaccard but containment 1.0).
    * Same inverted-index shape as the test-vs-train containment, joined
    * against the corpus itself: containment(a→b) = |sh(a)∩sh(b)|/|sh(a)|
    * with a the smaller shingle set (ties break a < b), the container
    * side df-capped (`maxDf`) like the decontamination index. Output:
    * (contained_id, container_id, inter, n_contained, containment).
    */
  def selfContainment(docs: DataFrame, textCol: String = "text",
                      threshold: Double = 0.9, shingleSize: Int = 3,
                      maxDf: Long = DefaultMaxDf): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sh = Dedup.shingleRows(docs, textCol, shingleSize)
      .localCheckpoint()
    val index0 = sh.select(col("doc_id").as("container_id"), col("g"))
    val index =
      if (maxDf <= 0L) index0
      else {
        val dfc = index0.groupBy("g").agg(count(lit(1)).as("_df"))
          .where(col("_df") <= maxDf).select("g")
        index0.join(dfc, Seq("g"), "left_semi")
      }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("_n"))
    val matches = sh.select(col("doc_id").as("contained_id"), col("g"))
      .join(index, Seq("g"))
      .where(col("contained_id") =!= col("container_id"))
      .groupBy("contained_id", "container_id")
      .agg(count(lit(1)).as("inter"))
    matches
      .join(sizes.select(col("doc_id").as("contained_id"),
        col("_n").as("n_contained")), Seq("contained_id"))
      .join(sizes.select(col("doc_id").as("container_id"),
        col("_n").as("_nb")), Seq("container_id"))
      .where(col("n_contained") < col("_nb") ||
        (col("n_contained") === col("_nb") &&
          col("contained_id") < col("container_id")))
      .withColumn("containment",
        round(col("inter").cast("double") / col("n_contained"), 6))
      .where(col("containment") >= threshold)
      .select("contained_id", "container_id", "inter", "n_contained",
        "containment")
  }

  /** SPAN-LEVEL leak report: for each test/benchmark document, the
    * maximal contiguous token runs that appear verbatim (≥ k tokens)
    * anywhere in the training corpus — the audit artifact a containment
    * SCORE can't give ("0.71 contaminated" vs "tokens 0-11 and 18-25
    * leaked, here is the text"). Same exactness argument as
    * [[SpanDedup.maximalRepeatedSpans]]: a leaked span of length L ≥ k
    * is precisely a maximal island of positions covered by test
    * k-windows whose digests exist in the train window set.
    *
    * Scale shape: both sides reduce to 16-byte window digests; the train
    * side collapses to one row per distinct digest (after the optional
    * `maxDf` stop-window cap — windows in more than maxDf train DOCS
    * drop, the [[contaminatedTrainIds]] hot-key answer); coverage is a
    * ×k explode of MATCHED test windows only; the island merge windows
    * per test doc over covered positions. Nothing is corpus×test.
    *
    * Output: (doc_id [test], span_start, span_len, span_text),
    * span_start 0-based in kernel tokens.
    */
  def leakedSpans(test: DataFrame, train: DataFrame, k: Int = 8,
                  textCol: String = "text",
                  maxDf: Long = DefaultMaxDf): DataFrame = {
    require(k >= 2, s"span window must be at least 2 tokens, got $k")
    import org.apache.spark.sql.expressions.Window
    def winRows(df: DataFrame) = {
      val toksCol = TextAnalysis.kernelTokens(col(textCol))
      df.select(col("doc_id"),
          when(size(toksCol) >= k,
            graft.functions.NGramShingles.shingles(col(textCol), k))
            .otherwise(array().cast("array<string>")).as("wins"))
        .select(col("doc_id"), posexplode(col("wins")).as(Seq("wpos", "w")))
        .select(col("doc_id"), col("wpos"), md5(col("w")).as("dig"))
    }
    val trainW = winRows(train)
    val trainSet = (
      if (maxDf <= 0L) trainW
      else trainW.join(
        trainW.groupBy("dig").agg(count_distinct(col("doc_id")).as("_df"))
          .where(col("_df") <= maxDf).select("dig"),
        Seq("dig"), "left_semi")
    ).select("dig").distinct()
    val covered = winRows(test).join(trainSet, Seq("dig"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("wpos"), col("wpos") + lit(k - 1))).as("pos"))
      .distinct()
    val isl = covered.withColumn("_g",
      col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val spans = isl.groupBy(col("doc_id"), col("_g"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        count(lit(1)).as("span_len"))
    val affectedToks = test
      .join(spans.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), TextAnalysis.kernelTokens(col(textCol)).as("_toks"))
    spans.join(affectedToks, Seq("doc_id"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
        array_join(slice(col("_toks"), (col("span_start") + 1).cast("int"),
          col("span_len").cast("int")), " ").as("span_text"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * inverse reading of the contamination index: what fraction of the
    * document's distinct shingles does the reference NOT already
    * contain? Drives dedup-aware sampling ("prefer novel documents"),
    * incremental-crawl triage (yesterday's corpus as reference), and
    * synthetic-data filtering (reject regurgitation of the seed set).
    *
    * Scale shape: both sides collapse to distinct shingle-digest rows;
    * the reference side further collapses to ONE row per distinct
    * shingle, so the left-semi join fans out at most one match per doc
    * shingle — no maxDf cap needed (there is no per-key fan-out to cap,
    * unlike the containment join). Output: (doc_id, n_shingles, n_seen,
    * novelty ∈ [0,1]); null-text docs carry 0 shingles and null novelty.
    */
  def noveltyScores(docs: DataFrame, reference: DataFrame,
                    textCol: String = "text", shingleSize: Int = 3,
                    scheme: HashScheme = HashScheme.Fast): DataFrame = {
    val docSh = Dedup.shingleRows(docs, textCol, shingleSize, scheme)
    val refSet = Dedup.shingleRows(reference, textCol, shingleSize, scheme)
      .select("g").distinct()
    val sizes = docSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val seen = docSh.join(refSet, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_seen"))
    docs.select("doc_id")
      .join(sizes, Seq("doc_id"), "left_outer")
      .join(seen, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0L,
          round(lit(1.0d) - coalesce(col("n_seen"), lit(0L)).cast("double")
            / col("n_shingles"), 6)).as("novelty"))
  }

  /** Embedding-space decontamination — the semantic sibling of [[report]]
    * for paraphrased/translated benchmark leakage that n-gram containment
    * misses entirely (zero shingle overlap, same meaning). Train vectors
    * are assigned to their ONE nearest centroid (the corpus-sized side is
    * scanned once, never exploded); each benchmark vector probes its
    * `nProbe` nearest centroids — recall lost to cluster-boundary splits
    * is bought back by multiplying only the SMALL side. Cosine is rounded
    * to 6 dp before the threshold so the keep/flag frontier is
    * engine-portable.
    *
    * Scale shape: one shuffle-free centroid argmin over the corpus, one
    * broadcast join (the exploded benchmark side is nProbe× a benchmark —
    * still tiny), one partial-aggregated groupBy on test_id. A (test,
    * train) pair can never double-count: the train side carries exactly
    * one cluster id, and the probe list holds distinct ids by
    * construction.
    */
  private def semanticScoredPairs(test: DataFrame, train: DataFrame,
                                  centroids: Array[Array[Double]],
                                  tau: Double, nProbe: Int,
                                  idCol: String, vecCol: String): DataFrame = {
    val tr = train.select(col(idCol).as("train_id"), col(vecCol).as("_tv"))
      .withColumn("cluster_id", Clustering.assignColumn(col("_tv"), centroids))
    val te = test.select(col(idCol).as("test_id"), col(vecCol).as("_qv"))
      .withColumn("cluster_id",
        explode(Clustering.probesColumn(col("_qv"), centroids, nProbe)))
    tr.join(broadcast(te), Seq("cluster_id"))
      .withColumn("cosine",
        round(graft.functions.VectorOps.cosine(col("_tv"), col("_qv")), 6))
      .where(col("cosine") >= tau)
  }

  /** Per benchmark vector: best-matching train vector (max cosine, min
    * train_id tiebreak), its cosine, and how many train vectors clear
    * `tau` within the probed clusters.
    */
  def semanticReport(test: DataFrame, train: DataFrame,
                     centroids: Array[Array[Double]], tau: Double,
                     nProbe: Int = 2, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    semanticScoredPairs(test, train, centroids, tau, nProbe, idCol, vecCol)
      .groupBy("test_id")
      .agg(max(struct(col("cosine"), (-col("train_id")).as("_neg"))).as("_best"),
        count(lit(1)).as("n_matches"),
        round(max(col("cosine")), 6).as("max_cosine"))
      .select(col("test_id"),
        (-col("_best._neg")).cast("long").as("best_train_id"),
        col("max_cosine"), col("n_matches"))

  /** The DROP set: every train vector within cosine `tau` of ANY
    * benchmark vector's probed clusters — one `idCol` column for a
    * left_anti join against the corpus.
    */
  def semanticContaminatedTrainIds(test: DataFrame, train: DataFrame,
                                   centroids: Array[Array[Double]],
                                   tau: Double, nProbe: Int = 2,
                                   idCol: String = "vec_id",
                                   vecCol: String = "embedding"): DataFrame =
    semanticScoredPairs(test, train, centroids, tau, nProbe, idCol, vecCol)
      .select(col("train_id").as(idCol)).distinct()
}

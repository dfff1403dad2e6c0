package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature Naive Bayes quality classifier — the fastText-style
  * "trained on a trusted seed corpus" filter used by the GPT-3 / LLaMA /
  * CCNet data recipes: train log-odds weights from a POSITIVE corpus
  * (e.g. curated reference text) and a NEGATIVE corpus (e.g. raw crawl),
  * then score and filter candidate documents by which side their hashed
  * n-gram distribution favors. Beyond-reference surface (SURVEY §2.13).
  *
  * Relationship to [[Dsir]]: DSIR answers "how much does this document
  * look like the target DISTRIBUTION" (importance ratio for resampling);
  * the classifier answers "which of two labeled classes does it belong
  * to" (decision + margin for hard filtering). The two share the hashed
  * unigram+bigram featurizer and the micro-log10 integer-sum portability
  * trick, and real pipelines run both (classifier to cut junk, DSIR to
  * match the domain mix).
  *
  * Determinism / engine portability:
  *  - feature bucket = 60-bit md5 prefix mod `buckets`
  *    ([[Dsir.featureBucket]]) — identical integer in Spark and DuckDB;
  *  - per-bucket weight w(b) = log10 P(b|pos) − log10 P(b|neg) with
  *    add-one smoothing, rounded to integer MICRO-log10 units before any
  *    per-document sum, so document scores are exact integer arithmetic
  *    with no float-order dependence;
  *  - the class prior log10(Np/Nn) (document counts) rides as a separate
  *    micro-integer column so score = prior + Σ w(feature) stays exact.
  *
  * 100 TB shape: the two training censuses partial-aggregate map-side to
  * ≤ `buckets` rows each; the weight table (≤ `buckets` rows) broadcasts
  * onto the candidate token stream; per-document sums are one
  * partial-aggregated shuffle on doc_id. Nothing driver-side; both
  * training corpora stream.
  */
object Classifier {

  /** Per-bucket micro-log10 Naive Bayes weights from labeled corpora:
    * w(b) = log10((cp_b + 1) / (CP + B)) − log10((cn_b + 1) / (CN + B))
    * computed as one log10 of the cross ratio (fixed operation order,
    * mirrored by the oracle). Output: (b, w_micro) for every bucket seen
    * in EITHER class — unseen buckets get weight 0 by construction of
    * the left join in [[score]] (coalesce to 0), which equals the
    * smoothed weight only up to the prior-mass difference; buckets never
    * observed in training carry no evidence, matching the standard
    * hashed-NB treatment.
    */
  def trainNaiveBayes(positive: DataFrame, negative: DataFrame,
                      buckets: Int = 4096,
                      textCol: String = "text"): DataFrame = {
    // each ≤`buckets`-row census is referenced TWICE below (the
    // full_outer model join AND its class-total broadcast subquery), and
    // broadcast subqueries re-execute their subtree — pin each census
    // once (round 9, guide §5) so the tokenize+hash pass over each seed
    // corpus runs once per class, not twice
    val pCensus = Dsir.featureRows(positive, textCol)
      .groupBy(Dsir.featureBucket(col("t"), buckets).as("b"))
      .agg(count(lit(1)).as("cp"))
      .localCheckpoint(false)
    val nCensus = Dsir.featureRows(negative, textCol)
      .groupBy(Dsir.featureBucket(col("t"), buckets).as("b"))
      .agg(count(lit(1)).as("cn"))
      .localCheckpoint(false)
    val pTot = pCensus.agg(coalesce(sum(col("cp")), lit(0L)).as("cptot"))
    val nTot = nCensus.agg(coalesce(sum(col("cn")), lit(0L)).as("cntot"))
    pCensus.join(nCensus, Seq("b"), "full_outer")
      .na.fill(0L, Seq("cp", "cn"))
      .crossJoin(broadcast(pTot)).crossJoin(broadcast(nTot))
      // (cp+1)·(CN+B) / ((cn+1)·(CP+B)), one log10 at the end — the
      // same cast placement the oracle replays
      .withColumn("w_micro",
        round(log10((col("cp").cast("double") + 1.0d)
            * (col("cntot").cast("double") + buckets.toDouble)
          / ((col("cn").cast("double") + 1.0d)
            * (col("cptot").cast("double") + buckets.toDouble))) * 1e6)
          .cast("long"))
      .select("b", "w_micro")
  }

  /** Micro-log10 class prior log10(Np/Nn) over DOCUMENT counts (add-one
    * smoothed so an empty class cannot produce ±∞). One row, broadcast.
    */
  def classPrior(positive: DataFrame, negative: DataFrame): DataFrame = {
    val np = positive.agg(count(lit(1)).as("np"))
    val nn = negative.agg(count(lit(1)).as("nn"))
    np.crossJoin(nn).select(
      round(log10((col("np").cast("double") + 1.0d)
        / (col("nn").cast("double") + 1.0d)) * 1e6).cast("long")
        .as("prior_micro"))
  }

  /** Score candidate documents under a trained model: per-document
    * n_feats, the exact integer micro-log-odds sum (prior + Σ w), its
    * 6 dp per-feature rendering, and the hard decision
    * (score_micro > 0 ⇔ positive class more likely). Zero-feature
    * documents keep a row with the bare prior as their score (the NB
    * decision with no evidence) and null per-feature average.
    */
  def score(candidates: DataFrame, model: DataFrame, prior: DataFrame,
            buckets: Int = 4096, textCol: String = "text"): DataFrame = {
    val feats = Dsir.featureRows(candidates, textCol)
      .select(col("doc_id"), Dsir.featureBucket(col("t"), buckets).as("b"))
    val agg = feats.join(broadcast(model), Seq("b"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_micro"), lit(0L))).as("w_sum_micro"))
    candidates.select("doc_id").join(agg, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        (coalesce(col("w_sum_micro"), lit(0L)) + col("prior_micro"))
          .as("score_micro"),
        // null (not NaN) for zero-feature docs: w_sum_micro is null from
        // the left join and null propagates identically on both engines —
        // a 0/0 here would be NaN in Spark but engine-defined elsewhere
        round(col("w_sum_micro").cast("double")
          / col("n_feats") / 1e6, 6).as("w_per_feat"),
        (coalesce(col("w_sum_micro"), lit(0L)) + col("prior_micro") > 0L)
          .as("pred_positive"))
  }

  /** Train + score in one call (the common case: seed corpora are
    * distinguished subsets of one frame).
    */
  def scoreAgainst(candidates: DataFrame, positive: DataFrame,
                   negative: DataFrame, buckets: Int = 4096,
                   textCol: String = "text"): DataFrame =
    score(candidates, trainNaiveBayes(positive, negative, buckets, textCol),
      classPrior(positive, negative), buckets, textCol)

  /** STATELESS scorer — the model-serving path: weights collected to a
    * dense `buckets`-sized array literal (driver-bounded by
    * construction: the model never exceeds `buckets` rows) and applied
    * as one pure column expression — tokenize, bucket, O(1)
    * array-index lookup, integer sum. No join, no aggregation, no
    * shuffle, which means it drops unchanged into a Structured
    * Streaming `readStream` projection (stateful ops can't), a
    * broadcast-starved edge executor, or a `filter` pushed against a
    * scan. Output contract is IDENTICAL to [[score]] (pinned by spec):
    * same n_feats, exact same integer score_micro, same null-margin
    * rule for zero-feature docs.
    */
  def scoreStateless(candidates: DataFrame, model: DataFrame, prior: DataFrame,
                     buckets: Int = 4096,
                     textCol: String = "text"): DataFrame =
    statelessScored(candidates, model, prior, buckets, textCol)
      .select("doc_id", "n_feats", "score_micro", "w_per_feat", "pred_positive")

  /** [[scoreStateless]] keeping the input columns — the score columns
    * APPEND to the candidate frame, so a streaming pipeline can filter
    * on the score and keep flowing the document text without a
    * stream-stream join back.
    */
  def statelessScored(candidates: DataFrame, model: DataFrame, prior: DataFrame,
                      buckets: Int = 4096,
                      textCol: String = "text"): DataFrame = {
    val weights = new Array[Long](buckets)
    model.collect().foreach(r => weights(r.getLong(0).toInt) = r.getLong(1))
    val priorMicro = prior.head().getLong(0)
    val warr = typedLit(weights.toSeq)
    val text = col(textCol)
    val unis = filter(TextAnalysis.tokens(TextAnalysis.normalized(text)),
      t => t =!= "")
    val bis = filter(Dedup.shingles(text, 2), g => size(split(g, " ")) === 2)
    val feats = when(text.isNull, array().cast("array<string>"))
      .otherwise(concat(unis, bis))
    val wSum = aggregate(
      transform(feats, f =>
        element_at(warr, (Dsir.featureBucket(f, buckets) + 1L).cast("int"))),
      lit(0L), _ + _)
    candidates
      .withColumn("_nf", size(feats))
      .withColumn("_w", wSum)
      .withColumn("n_feats", col("_nf").cast("long"))
      .withColumn("score_micro", col("_w") + lit(priorMicro))
      .withColumn("w_per_feat",
        when(col("_nf") > 0,
          round(col("_w").cast("double") / col("_nf") / 1e6, 6)))
      .withColumn("pred_positive", col("_w") + lit(priorMicro) > 0L)
      .drop("_nf", "_w")
  }

  /** Trained multi-class language-ID model (fastText-style): per-class
    * dense micro-log10 feature weights (unseen buckets pre-filled with
    * the class's smoothing floor log10(1/(C_ℓ+B)) — a zero there would
    * bias classes with different feature masses) plus micro priors
    * log10((n_ℓ+1)/(N+L)). Driver-bounded by construction: L·B longs.
    */
  final case class LangIdModel(buckets: Int, classes: Seq[String],
                               priorsMicro: Map[String, Long],
                               weights: Map[String, Array[Long]])

  /** Train the multi-class hashed-NB language identifier from a frame
    * with a label column (null labels pool under "und"). All weight
    * arithmetic runs IN the engine (the same round(log10(·)·1e6) ops the
    * gate-proven binary path uses), then collects the ≤ L·B-row model —
    * so an external oracle replays the exact same doubles. The trained
    * langid replaces the char-frequency heuristic where a labeled seed
    * corpus exists; [[classifyLanguage]] serves it statelessly.
    */
  def trainLanguageNB(labeled: DataFrame, buckets: Int = 1024,
                      textCol: String = "text",
                      classCol: String = "lang"): LangIdModel = {
    val labels = labeled.select(col("doc_id"),
      coalesce(col(classCol), lit("und")).as("_cls"))
    // ≤ L·B rows; cached — the totals fill, the weight collect, and the
    // defaults all re-derive it, and each re-derivation is a full pass
    // over the exploded feature stream
    val census = Dsir.featureRows(labeled, textCol)
      .select(col("doc_id"), Dsir.featureBucket(col("t"), buckets).as("b"))
      .join(labels, Seq("doc_id"))
      .groupBy("_cls", "b").agg(count(lit(1)).as("c"))
      .cache()
    val totals = census.groupBy("_cls").agg(sum("c").as("ct")).cache()
    val clsCounts = labels.groupBy("_cls").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val nDocs = clsCounts.map(_._2).sum
    val nCls = clsCounts.length
    val defaults = totals
      .select(col("_cls"),
        round(log10(lit(1.0d) / (col("ct").cast("double") + buckets.toDouble)) * 1e6)
          .cast("long").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dense = clsCounts.map { case (cls, _) =>
      cls -> Array.fill(buckets)(defaults.getOrElse(cls, 0L))
    }.toMap
    census.join(totals, Seq("_cls"))
      .select(col("_cls"), col("b"),
        round(log10((col("c").cast("double") + 1.0d)
          / (col("ct").cast("double") + buckets.toDouble)) * 1e6)
          .cast("long").as("w"))
      .collect()
      .foreach(r => dense(r.getString(0))(r.getLong(1).toInt) = r.getLong(2))
    // priors through the same engine round(log10(·)·1e6) path as the
    // weights — driver Math.log10/rint could differ in ulp or tie rule
    val priors = labels.groupBy("_cls").agg(count(lit(1)).as("nd"))
      .select(col("_cls"),
        round(log10((col("nd").cast("double") + 1.0d)
          / lit((nDocs + nCls).toDouble)) * 1e6).cast("long").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    LangIdModel(buckets, clsCounts.map(_._1).toSeq, priors, dense)
  }

  /** STATELESS multi-class serving: one pure projection — tokenize,
    * bucket, per-class O(1) dense-array lookups, integer sums, argmax
    * (ties to the lexicographically first class via struct-min on
    * (−score, class)). No join, no shuffle — readStream-compatible like
    * [[scoreStateless]]. Zero-feature docs score bare priors, so they
    * predict the majority class deterministically. Output: (doc_id,
    * n_feats, pred_lang, score_micro).
    */
  def classifyLanguage(candidates: DataFrame, model: LangIdModel,
                       textCol: String = "text"): DataFrame =
    classifyLanguageTagged(candidates, model, textCol)
      .select("doc_id", "n_feats", "pred_lang", "score_micro")

  /** [[classifyLanguage]] keeping the input columns — the prediction
    * APPENDS to the candidate frame (streaming pipelines tag and keep
    * flowing; no join back).
    */
  def classifyLanguageTagged(candidates: DataFrame, model: LangIdModel,
                             textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val unis = filter(TextAnalysis.tokens(TextAnalysis.normalized(text)),
      t => t =!= "")
    val bis = filter(Dedup.shingles(text, 2), g => size(split(g, " ")) === 2)
    val feats = when(text.isNull, array().cast("array<string>"))
      .otherwise(concat(unis, bis))
    val scored = model.classes.map { cls =>
      val warr = typedLit(model.weights(cls).toSeq)
      val s = aggregate(
        transform(col("_feats"), f =>
          element_at(warr, (Dsir.featureBucket(f, model.buckets) + 1L).cast("int"))),
        lit(0L), _ + _) + lit(model.priorsMicro(cls))
      struct((-s).as("neg"), lit(cls).as("cls"))
    }
    candidates
      .withColumn("_feats", feats)
      .withColumn("_best", array_min(array(scored: _*)))
      .withColumn("n_feats", size(col("_feats")).cast("long"))
      .withColumn("pred_lang", col("_best.cls"))
      .withColumn("score_micro", -col("_best.neg"))
      .drop("_feats", "_best")
  }

  /** The FULL (doc, class) score frame behind [[classifyLanguage]]'s
    * argmax — one row per candidate × class, same stateless projection
    * (dense-array lookups, exact integer micro sums, priors included).
    * The frame [[labelNoise]] consumes. Output: (doc_id, cls,
    * score_micro, n_feats).
    */
  def classScores(candidates: DataFrame, model: LangIdModel,
                  textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val unis = filter(TextAnalysis.tokens(TextAnalysis.normalized(text)),
      t => t =!= "")
    val bis = filter(Dedup.shingles(text, 2), g => size(split(g, " ")) === 2)
    val feats = when(text.isNull, array().cast("array<string>"))
      .otherwise(concat(unis, bis))
    val perClass = model.classes.map { cls =>
      val warr = typedLit(model.weights(cls).toSeq)
      val s = aggregate(
        transform(col("_feats"), f =>
          element_at(warr, (Dsir.featureBucket(f, model.buckets) + 1L).cast("int"))),
        lit(0L), _ + _) + lit(model.priorsMicro(cls))
      struct(lit(cls).as("cls"), s.as("score_micro"))
    }
    candidates
      .withColumn("_feats", feats)
      .select(col("doc_id"), size(col("_feats")).cast("long").as("n_feats"),
        explode(array(perClass: _*)).as("sc"))
      .select(col("doc_id"), col("sc.cls").as("cls"),
        col("sc.score_micro").as("score_micro"), col("n_feats"))
  }

  /** Confident-learning label-noise detection (Northcutt et al.,
    * "Confident Learning", JAIR 2021 — the simplest per-class-threshold
    * variant): an example joins class k's CONFIDENT set when its score
    * clears the class threshold t_k = mean score of examples LABELED k;
    * the confident suggestion is the argmax over the classes it
    * qualifies for, and the example is flagged iff that suggestion
    * disagrees with its label. The training-data use: surface mislabeled
    * seed-corpus rows (a "de" document that scores confidently "en")
    * before they poison a filter model.
    *
    * Exactness: thresholds stay EXACT (sum, count) integer pairs and
    * membership is the cross-multiplied s·n_k ≥ S_k (n_k > 0 preserves
    * the inequality; DECIMAL(38,0) headroom) — no division anywhere, so
    * the verdict frame is hash-exact. Shapes: one broadcast of the
    * ≤L-row threshold census; candidate explode bounded by docs × L;
    * argmax at doc grain. Output: (doc_id, label, suggested, flagged).
    */
  def labelNoise(scored0: DataFrame, labels: DataFrame): DataFrame = {
    // the scored frame feeds both the per-class thresholds and the
    // confident-set probe; materialize it once (lazy local checkpoint,
    // computed in the query's own first job) instead of re-running the
    // full feature-hash scoring pass — classScores carries the dense
    // per-class weight arrays, the most expensive projection here
    val scored = scored0.localCheckpoint(false)
    val lab = labels.select(col("doc_id"), col("label"))
    val thr = scored.join(lab, Seq("doc_id"))
      .where(col("cls") === col("label"))
      .groupBy("cls")
      .agg(sum(col("score_micro")).as("s_sum"), count(lit(1)).as("s_n"))
    val cand = scored.join(broadcast(thr), Seq("cls"))
      .where(col("score_micro").cast("decimal(38,0)") * col("s_n")
        >= col("s_sum").cast("decimal(38,0)"))
    val best = cand.groupBy("doc_id")
      .agg(min(struct((-col("score_micro")).as("neg"),
        col("cls").as("cls"))).as("b"))
      .select(col("doc_id"), col("b.cls").as("suggested"))
    lab.join(best, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("label"),
        coalesce(col("suggested"), col("label")).as("suggested"),
        (col("suggested").isNotNull &&
          col("suggested") =!= col("label")).as("flagged"))
  }

  /** Hard quality filter: keep candidates whose per-feature average
    * log-odds clears `minWPerFeat` (per-feature, not the raw sum, so
    * document length does not swamp the decision — the same reasoning as
    * [[Dsir.resample]]). Zero-feature docs carry no evidence and are
    * dropped; route them separately if they should be kept.
    */
  def filterByClassifier(candidates: DataFrame, positive: DataFrame,
                         negative: DataFrame, minWPerFeat: Double = 0.0,
                         buckets: Int = 4096,
                         textCol: String = "text"): DataFrame =
    filterByClassifierImpl(candidates, positive, negative, minWPerFeat,
      buckets, textCol)

  /** Per-document decision explanation — NB's log-odds score is a SUM,
    * so its exact attribution is free: each token's contribution is
    * n_occurrences · w(bucket), and the top-k by absolute weight ARE
    * the "why" ("this doc scored spam because of these 5 tokens") — the
    * model-side explainability twin of [[KnnShapley]]'s data-side
    * values, with none of SHAP's sampling because linearity makes the
    * decomposition exact. Tokens whose buckets carry no trained weight
    * (or exactly cancel to 0) contribute nothing and are dropped.
    *
    * Scale shape: the feature explode + ONE broadcast model join
    * (model ≤ buckets rows by construction) + (doc × token) partial
    * agg; the top-k is the row_number spelling, so it rides the
    * GroupedTopK heap rewrite — shuffle k-bounded per doc × partition.
    *
    * Output: (doc_id, t, b, n_occ, contrib_micro, rank), rank 1..k by
    * (|contrib| desc, token asc) — a total order, so deterministic.
    */
  def explain(candidates: DataFrame, model: DataFrame, k: Int,
              buckets: Int = 4096, textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val feats = Dsir.featureRows(candidates, textCol)
      .select(col("doc_id"), col("t"),
        Dsir.featureBucket(col("t"), buckets).as("b"))
    val contrib = feats.join(broadcast(model), Seq("b"))
      .groupBy("doc_id", "t")
      .agg(first(col("b")).as("b"), count(lit(1)).as("n_occ"),
        sum(col("w_micro")).as("contrib_micro"))
      .where(col("contrib_micro") =!= 0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(abs(col("contrib_micro")).desc, col("t").asc)
    contrib.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Code-switching / language-mixing detection — classify fixed-size
    * TOKEN SEGMENTS of each document with the trained [[LangIdModel]]
    * and report per-doc mixing: a doc whose segments disagree is
    * code-switched (or a concatenation artifact — crawl boilerplate
    * glued to body text), which a whole-doc language id by construction
    * cannot see (it averages the evidence away). The mixing share is
    * the cleanup trigger: split, re-route, or drop.
    *
    * Segments re-enter the standard feature path (slice the normalized
    * token stream, re-join, re-tokenize — idempotent on normalized
    * text), so segment predictions use the EXACT stateless-serving
    * arithmetic and tie rule. Zero-token docs carry no segments and are
    * excluded.
    *
    * Scale shape: segmentation is a projection; scoring is the
    * stateless dense-array path (no join); the per-doc rollup is one
    * partial-agg shuffle at (doc × lang ≤ segments) grain with a
    * doc-grain argmax window. `segTokens ≥ 1`; synthetic segment ids
    * assume < 100k segments per doc (8-token segments → 800k-token
    * docs; enforce upstream).
    */
  def codeSwitching(docs: DataFrame, model: LangIdModel, segTokens: Int,
                    textCol: String = "text"): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
          .as("toks"))
      .where(size(col("toks")) > 0)
    val segRows = toks
      .select(col("doc_id"), explode(sequence(lit(0L),
        expr(s"(size(toks) - 1) div $segTokens"))).as("seg"),
        col("toks"))
      .select((col("doc_id") * 100000L + col("seg")).as("doc_id"),
        array_join(slice(col("toks"),
          (col("seg") * segTokens + 1).cast("int"), lit(segTokens)), " ")
          .as("text"))
    val seg = classifyLanguage(segRows, model, "text")
      .select(expr("doc_id div 100000").as("doc_id"), col("pred_lang"))
    val census = seg.groupBy("doc_id", "pred_lang")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("n").desc, col("pred_lang").asc)
    census
      .withColumn("_rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_segs"),
        count(lit(1)).as("n_langs"),
        max(when(col("_rn") === 1, col("pred_lang"))).as("majority_lang"),
        max(when(col("_rn") === 1, col("n"))).as("n_majority"))
      .withColumn("majority_share",
        col("n_majority").cast("double") / col("n_segs"))
      .withColumn("switched", col("n_langs") > 1L)
  }

  private def filterByClassifierImpl(candidates: DataFrame, positive: DataFrame,
                         negative: DataFrame, minWPerFeat: Double = 0.0,
                         buckets: Int = 4096,
                         textCol: String = "text"): DataFrame = {
    val kept = scoreAgainst(candidates, positive, negative, buckets, textCol)
      .where(col("n_feats") > 0 && col("w_per_feat") >= minWPerFeat)
      .select("doc_id")
    candidates.join(kept, Seq("doc_id"), "left_semi")
  }
}

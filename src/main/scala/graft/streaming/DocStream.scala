package graft.streaming

import graft.operators.{Boilerplate, Classifier, Dedup, QualityFilter, SignatureIndex, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingestion for a training-data pipeline: a document
  * stream is deduplicated against the already-ingested corpus AND within
  * itself before it is appended — the streaming counterpart of the batch
  * incremental-dedup path ([[graft.operators.Dedup.dedupAgainstExact]] /
  * the persisted fingerprint index).
  *
  * Batch/stream agnostic like [[EventStream]]: the same transform runs as
  * a batch query (what the correctness gate replays in SQL) or
  * incrementally under a streaming source.
  */
object DocStream {

  /** Documents not yet in the corpus, one survivor per content
    * fingerprint.
    *
    *  - new-vs-corpus: stream-static LEFT ANTI join on the md5 content
    *    fingerprint. The static side is re-read every micro-batch, so
    *    corpus compactions are picked up without restarting the query. No
    *    forced broadcast: at 100 TB the fingerprint index is itself large —
    *    leave the strategy to the planner (bucketed/partitioned parquet on
    *    fp makes it a co-located join; a bloom pre-filter is the
    *    documented next step if the index outgrows that).
    *  - in-stream collapse: streaming uses dropDuplicatesWithinWatermark
    *    (state bounded by the watermark horizon — an unbounded
    *    dropDuplicates grows state forever on an endless stream); batch
    *    uses plain dropDuplicates. Streaming input must therefore carry an
    *    event-time column `ts`.
    *
    * @param corpusFps one `fp` column (md5 hex) — the ingested corpus's
    *                  fingerprint set
    */
  def newUniqueDocs(docs: DataFrame, corpusFps: DataFrame,
                    textCol: String = "text",
                    watermark: String = "10 minutes"): DataFrame = {
    val fresh = docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .join(corpusFps.select("fp"), Seq("fp"), "left_anti")
    if (docs.isStreaming)
      fresh.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("fp"))
    else fresh.dropDuplicates(Seq("fp"))
  }

  /** The STREAMING cleaning head — DataPipeline's stages 1–3b composed
    * for a document stream: markup strip → Gopher quality filter →
    * boilerplate-line removal → stateless NB quality filter → trained
    * langid tag. Every stage is a pure projection, a filter, or a
    * stream-static join, so the whole composition runs in append mode
    * with NO state store and identically in batch (the spec pins
    * streamed ≡ batch).
    *
    * The corpus-census stages that CANNOT be derived from a stream
    * arrive as precomputed artifacts, the same way the dedup stages take
    * the fingerprint set / signature index:
    *  - `boilerplateDigests`: the md5 line digests from a batch
    *    [[Boilerplate.boilerplateLines]] census over the ingested corpus
    *    (driver-side, broadcast-literal-sized by construction — restart
    *    the query to pick up a nightly census refresh);
    *  - `nbModel`/`nbPrior` and `langid`: batch-trained models served
    *    through their stateless paths.
    *
    * Near-/exact-dedup intentionally stay SEPARATE streaming steps
    * ([[newUniqueDocs]], [[nearDupCandidates]]) — they need watermark
    * state or candidate logs, which would drag the stateless head into
    * stateful semantics.
    *
    * Output: (doc_id, text [cleaned], pred_lang) for surviving docs.
    */
  def cleanStream(docs: DataFrame, boilerplateDigests: Seq[String],
                  nbModel: DataFrame, nbPrior: DataFrame,
                  langid: Classifier.LangIdModel,
                  rules: QualityFilter.Rules = QualityFilter.Rules(),
                  lineSep: String = "\n", nbBuckets: Int = 4096,
                  minWPerFeat: Double = 0.0,
                  textCol: String = "text"): DataFrame = {
    val stripped = docs.withColumn(textCol,
      TextAnalysis.stripMarkup(col(textCol)))
    val quality = QualityFilter(stripped, rules, textCol)
    val deBoiler = Boilerplate
      .removeKnownBoilerplate(quality, boilerplateDigests, lineSep, textCol)
      .where(length(col(textCol)) > 0)
    // both model stages APPEND their columns (statelessScored /
    // classifyLanguageTagged) — a select back via join would be a
    // stream-stream join needing watermarks; appending keeps the whole
    // head one stateless projection chain
    val nbKept = Classifier
      .statelessScored(deBoiler, nbModel, nbPrior, nbBuckets, textCol)
      .where(col("n_feats") > 0 && col("w_per_feat") >= minWPerFeat)
      .drop("n_feats", "score_micro", "w_per_feat", "pred_positive")
    Classifier.classifyLanguageTagged(nbKept, langid, textCol)
      .select(col("doc_id"), col(textCol), col("pred_lang"))
  }

  /** Streaming NEAR-duplicate candidates against a persisted corpus
    * [[SignatureIndex]] — the streaming counterpart of
    * [[Dedup.nearDuplicatesAgainst]]'s candidate stage.
    *
    * The per-document MinHash signature is computed as a STATELESS
    * projection: `array_min` over a per-row `transform` of the (already
    * materialized) shingle-key array — no groupBy, no shuffle, no state,
    * so the same plan runs in append-mode streaming and in batch. (The
    * batch path's explode+aggregate shape is faster at corpus scale
    * because the per-seed hashes stay in codegen'd aggregates; per
    * arriving document the interpreted lambda cost is microseconds and
    * buys streaming compatibility.) Banding is a stateless posexplode;
    * the candidate join is stream-static against the index's compact
    * band table.
    *
    * Emits (doc_id, corpus_id) pairs. Batch callers get them distinct;
    * a streaming query may see a pair once per matching band (bounded by
    * numBands) — deduplicate downstream with
    * `dropDuplicatesWithinWatermark` if the consumer needs exactly-once
    * pairs. Exact-Jaccard verification stays a batch step over the
    * candidate log: it needs the corpus shingle sets, which do not
    * belong in per-batch streaming state.
    */
  def nearDupCandidates(docs: DataFrame, index: SignatureIndex,
                        textCol: String = "text"): DataFrame = {
    val sh = Dedup.shingles(col(textCol), index.shingleSize, distinct = true)
    // two-step select: the md5/prep per shingle lands in its own
    // projection, so the numHashes seeded transforms below re-scan an
    // ATTRIBUTE, not the md5 chain
    val sigs = docs
      .select(col("doc_id"),
        transform(sh, s => index.scheme.prep(index.scheme.key(s))).as("_xs"))
      .select(col("doc_id"),
        array((0 until index.numHashes).map(i =>
          array_min(transform(col("_xs"), x => index.scheme.seeded(x, i)))): _*)
          .as("signature"))
    val joined = Dedup.lshBands(sigs, index.numBands, index.scheme)
      .join(index.bands
          .select(col("band"), col("band_hash"), col("doc_id").as("corpus_id")),
        Seq("band", "band_hash"))
      .select("doc_id", "corpus_id")
    if (docs.isStreaming) joined else joined.distinct()
  }

  /** Continuously-maintained per-language dataset card: row counter +
    * theta-sketch distinct-fingerprint estimate, as ONE streaming
    * aggregation. The sketch is a mergeable [[graft.functions.ThetaSketch]]
    * `TypedImperativeAggregate`, so Structured Streaming's state store
    * holds the compact sketch bytes per group and each micro-batch
    * merges in place — the "dataset card that is always current"
    * ingestion dashboards want, without any batch re-scan. Run with
    * `outputMode("complete")` (group-grain state, languages-bounded).
    *
    * Exact below 2^lgK distinct fps per group (the gate's regime), so
    * the batch-mode gate oracle replays it as COUNT(DISTINCT fp).
    */
  def runningCards(docs: DataFrame, textCol: String = "text",
                   lgK: Int = 14): DataFrame = {
    import graft.functions.ThetaSketch
    docs
      .select(coalesce(col("lang"), lit("unknown")).as("lang"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(ThetaSketch.estimate(ThetaSketch.thetaAgg(col("fp"), lgK)))
          .cast("long").as("distinct_fp"))
  }

  /** Continuously-maintained per-language QUANTILE card: doc-length
    * p50/p90 from a [[graft.functions.KllSketchAgg]] in the streaming
    * state store — the distribution half of [[runningCards]] ("did p90
    * doc length jump mid-ingest"), merging per micro-batch with no
    * re-scan. Below the sketch capacity (the gate regime) INCLUSIVE
    * quantiles are exact ⌈q·n⌉ order statistics, so the batch-mode
    * oracle replays them; past capacity the rank bounds hold.
    * `outputMode("complete")`, language-bounded state.
    */
  def runningQuantileCards(docs: DataFrame, k: Int = 1024): DataFrame = {
    import graft.functions.KllSketch
    docs
      .select(coalesce(col("lang"), lit("unknown")).as("lang"),
        col("n_chars"))
      .where(col("n_chars").isNotNull)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        KllSketch.kllQuantile(KllSketch.kllAgg(col("n_chars"), k),
          lit(0.5d)).as("p50"),
        KllSketch.kllQuantile(KllSketch.kllAgg(col("n_chars"), k),
          lit(0.9d)).as("p90"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-card statistics: the per-(lang, source) summary a data
  * release ships — document counts, token totals, duplicate-content
  * rate via exact distinct fingerprints.
  *
  * One partial-aggregated shuffle on the (lang, source) grain. At
  * 100 TB the only term that grows is `count_distinct(fp)`; swap in
  * `approx_count_distinct` (HLL) via `exact = false` when a ±2%
  * estimate is acceptable — the group-by shape is unchanged.
  */
object CorpusStats {

  def datasetCard(docs: DataFrame, textCol: String = "text",
                  exact: Boolean = true): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val fp = TextAnalysis.fingerprint(col(textCol))
    val distinctFp =
      if (exact) count_distinct(col("fp")) else approx_count_distinct(col("fp"))
    docs.select(col("lang"), col("source"),
        size(toks).as("n_toks"), length(col(textCol)).as("n_chars"), fp.as("fp"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_toks")), 6).as("avg_tokens"),
        distinctFp.as("distinct_fp"))
      .withColumn("dup_doc_frac",
        round(lit(1.0) - col("distinct_fp").cast("double") / col("n_docs"), 6))
  }

  /** MERGEABLE dataset card — the incremental-corpus design: per-group
    * counters plus a DataSketches HLL sketch of the content
    * fingerprints ([[org.apache.spark.sql.functions.hll_sketch_agg]]).
    * Unlike `count_distinct`, sketches UNION losslessly across shards,
    * days, or clusters — `card(A ∪ B) = merge(card(A), card(B))` with
    * no re-scan of either corpus — which is what a daily-loop pipeline
    * (cf. [[DataPipeline.prepareIncrement]]) needs to keep corpus-level
    * stats without re-reading 100 TB. Integer counters merge exactly;
    * distinct counts carry the sketch's standard ~1.6% relative error
    * at lgK 12 (gated by the self-asserting `a14_card_merge` harness).
    */
  def datasetCardSketch(docs: DataFrame, textCol: String = "text",
                        lgK: Int = 12): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    docs.select(col("lang"), col("source"),
        size(toks).as("n_toks"), length(col(textCol)).as("n_chars"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        hll_sketch_agg(col("fp"), lit(lgK)).as("fp_sketch"))
  }

  /** Merge shard/day cards from [[datasetCardSketch]] into one card of
    * the union corpus: counters add, sketches union, the estimate
    * materializes as `distinct_fp_est`. Output mirrors [[datasetCard]]
    * (dup_doc_frac derived from the estimate).
    */
  def mergeCards(cards: Seq[DataFrame]): DataFrame = {
    require(cards.nonEmpty, "need at least one card to merge")
    cards.reduce(_ unionByName _)
      .groupBy("lang", "source")
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("total_chars")).as("total_chars"),
        hll_union_agg(col("fp_sketch")).as("fp_sketch"))
      .withColumn("distinct_fp_est",
        hll_sketch_estimate(col("fp_sketch")))
      .withColumn("dup_doc_frac_est",
        round(lit(1.0) - col("distinct_fp_est").cast("double") / col("n_docs"), 6))
  }

  /** Snapshot diff — what changed between two corpus versions (crawls,
    * compactions): every doc_id present in either side, classified as
    *
    *  - "added":     only in `current`
    *  - "removed":   only in `previous`
    *  - "changed":   in both, normalized content fingerprint differs
    *  - "unchanged": in both, fingerprint equal
    *
    * One full-outer join on doc_id carrying 16-byte fingerprints, never
    * text — at 100 TB both sides reduce to (id, digest) before the
    * shuffle, so the diff costs two digest projections + one join
    * regardless of document sizes. Null text fingerprints compare with
    * null-safe equality (two null-text versions are "unchanged").
    */
  def snapshotDiff(previous: DataFrame, current: DataFrame,
                   textCol: String = "text"): DataFrame = {
    // presence flags, not fp-null checks: a null-TEXT doc has a null
    // fingerprint but is still present — it must not read as added/removed
    def fps(df: DataFrame, fp: String, in: String) = df.select(col("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as(fp), lit(true).as(in))
    fps(previous, "_fp_prev", "_in_prev")
      .join(fps(current, "_fp_cur", "_in_cur"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_in_prev").isNull, "added")
          .when(col("_in_cur").isNull, "removed")
          .when(col("_fp_prev") <=> col("_fp_cur"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Dedup-adjusted dataset card — the token counts that MATTER for a
    * training budget: raw tokens double-count every duplicate, so a
    * source that is 40% copies looks 1.7× bigger than the data it
    * actually contributes. Per (lang, source): raw vs unique-content
    * tokens (each distinct normalized fingerprint counted once) and
    * the duplicated-token fraction. Fingerprint-grain census (never
    * text through the shuffle — the [[snapshotDiff]] rule), then one
    * group rollup. Content is deduped WITHIN a group; the cross-group
    * overlap question belongs to the theta-sketch cards.
    */
  def dedupAdjustedCard(docs: DataFrame,
                        textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
    val base = docs.select(col("lang"), col("source"),
      size(toks).as("_n"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val fpCensus = base.groupBy("lang", "source", "fp")
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("toks_all"),
        min(col("_n")).as("toks_one"))
    fpCensus.groupBy("lang", "source")
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_unique_docs"),
        coalesce(sum(col("toks_all")), lit(0L)).as("tokens_raw"),
        coalesce(sum(col("toks_one")), lit(0L)).as("tokens_unique"))
      .withColumn("dup_token_frac",
        when(col("tokens_raw") > 0L,
          round(lit(1.0d) - col("tokens_unique").cast("double")
            / col("tokens_raw"), 6)))
  }

  /** Dataset card with MERGEABLE quantiles: per (lang, source), the
    * document-length p50/p90/p99 from a per-group KLL sketch
    * ([[graft.functions.KllSketchAgg]]) — counters and HLL cards
    * already merged across shards/days; this closes the gap for
    * distribution stats ("did p99 doc length jump in yesterday's
    * crawl") with O(k·log n) state per group and sketch-union merge,
    * no re-scan. One partial-agg shuffle; quantile evaluation is one
    * scalar call per GROUP row.
    *
    * In exact mode (group size ≤ sketch capacity) the INCLUSIVE
    * quantile is the ⌈q·n⌉-th order statistic — externally replayable;
    * past compaction the rank bounds hold but values are run-varying
    * (gate corpora pin group sizes under k).
    */
  def datasetCardQuantiles(docs: DataFrame, k: Int = 1024,
                           valueCol: String = "n_chars"): DataFrame = {
    val sk = graft.functions.KllSketch
    docs.where(col(valueCol).isNotNull)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sk.kllAgg(col(valueCol), k).as("_sk"))
      .select(col("lang"), col("source"), col("n_docs"),
        sk.kllQuantile(col("_sk"), lit(0.5d)).as("p50"),
        sk.kllQuantile(col("_sk"), lit(0.9d)).as("p90"),
        sk.kllQuantile(col("_sk"), lit(0.99d)).as("p99"))
  }
}

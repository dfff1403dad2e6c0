package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR) — select raw-corpus
  * documents whose hashed n-gram distribution resembles a small target
  * corpus (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"). Beyond-reference surface (SURVEY §2.13): the
  * standard pretraining-data curation step between quality filtering and
  * deduplication.
  *
  * The method: featurize every document as a bag of hashed unigrams +
  * bigrams over `buckets` buckets, fit two smoothed categorical models
  * (target vs raw) over bucket counts, score each raw document by its
  * log-likelihood ratio under the two models, then resample documents
  * with probability ∝ exp(score/T) WITHOUT replacement via the Gumbel
  * top-k trick — all deterministic here because both the feature hash
  * and the Gumbel noise derive from md5, not an RNG.
  *
  * Engine portability (the oracle replays every step bit-for-bit):
  *  - feature bucket = 60-bit md5 prefix mod `buckets` — same integer in
  *    Spark (`conv(substring(md5,1,15),16,10)`) and DuckDB
  *    (`('0x' || substr(md5,1,15))::BIGINT`);
  *  - per-bucket log-ratios are rounded to integer micro-log10 units
  *    BEFORE the per-document sum (the [[TextAnalysis.unigramLogProb]]
  *    trick), so document scores are exact integer arithmetic;
  *  - Gumbel keys are rounded to 6 dp before the top-k rank, with a
  *    doc_id tiebreak.
  *
  * 100 TB shape: two bucket censuses partial-aggregate map-side down to
  * ≤ `buckets` rows each; the ratio table is a broadcast join back onto
  * the token stream; the per-document sum is one partial-aggregated
  * shuffle on doc_id; the resample is TakeOrdered (per-partition top-k +
  * driver merge, never a global sort). The target corpus is typically
  * tiny (a benchmark or a trusted domain) but nothing here requires it —
  * both sides stream.
  */
object Dsir {

  /** Portable hashed feature bucket for a term (unigram or bigram). */
  def featureBucket(term: Column, buckets: Int): Column =
    pmod(conv(substring(md5(term), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** One row per feature OCCURRENCE: normalized-whitespace unigrams plus
    * adjacent bigrams (space-joined, so the two families cannot collide
    * pre-hash). Documents with fewer than n tokens simply contribute no
    * n-gram rows.
    */
  private[operators] def featureRows(docs: DataFrame, textCol: String): DataFrame = {
    val unis = docs
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("t"))
      .where(col("t") =!= "")
    val bis = docs
      .select(col("doc_id"), explode(Dedup.shingles(col(textCol), 2)).as("t"))
      .where(size(split(col("t"), " ")) === 2)
    unis.unionByName(bis)
  }

  /** Per-bucket micro-log10 importance ratios, add-one smoothed:
    * lr(b) = log10((ct_b + 1)·(CR + B) / ((cr_b + 1)·(CT + B))) where
    * ct/cr are target/raw occurrence counts, CT/CR the corresponding
    * totals and B the bucket count. Output: (b, lr_micro BIGINT) for
    * every bucket observed in RAW (buckets absent from raw can never be
    * joined by a raw document, so they are not materialized).
    */
  def bucketLogRatios(target: DataFrame, raw: DataFrame, buckets: Int,
                      textCol: String = "text"): DataFrame = {
    // each ≤`buckets`-row census is referenced twice (ratio join + total
    // broadcast subquery, which re-executes its subtree) — pin once so
    // each corpus is tokenized once (round 9, guide §5; the
    // trainNaiveBayes fix's twin)
    val tCensus = featureRows(target, textCol)
      .groupBy(featureBucket(col("t"), buckets).as("b"))
      .agg(count(lit(1)).as("ct"))
      .localCheckpoint(false)
    val rCensus = featureRows(raw, textCol)
      .groupBy(featureBucket(col("t"), buckets).as("b"))
      .agg(count(lit(1)).as("cr"))
      .localCheckpoint(false)
    val tTot = tCensus.agg(coalesce(sum(col("ct")), lit(0L)).as("ctot"))
    val rTot = rCensus.agg(coalesce(sum(col("cr")), lit(0L)).as("crtot"))
    rCensus.join(tCensus, Seq("b"), "left_outer")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      // cast placement mirrored by the oracle so the double ops replay
      // in order: (ct+1)·(CR+B) / ((cr+1)·(CT+B)), one log10 at the end
      .withColumn("lr_micro",
        round(log10((col("ct").cast("double") + 1.0d)
            * (col("crtot").cast("double") + buckets.toDouble)
          / ((col("cr").cast("double") + 1.0d)
            * (col("ctot").cast("double") + buckets.toDouble))) * 1e6)
          .cast("long"))
      .select("b", "lr_micro")
  }

  /** Per-document importance score over the RAW corpus: n_feats, the
    * exact integer micro-log sum, and its 6 dp double rendering.
    * Documents with zero features keep a row (null score) so the output
    * is a total function of the corpus — the caller decides their fate.
    */
  def scores(raw: DataFrame, target: DataFrame, buckets: Int = 4096,
             textCol: String = "text"): DataFrame = {
    val lr = bucketLogRatios(target, raw, buckets, textCol)
    val feats = featureRows(raw, textCol)
      .select(col("doc_id"), featureBucket(col("t"), buckets).as("b"))
    val agg = feats.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lr_micro")).as("llr_micro"))
    raw.select("doc_id").join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("llr_micro"),
        round(col("llr_micro").cast("double") / col("n_feats") / 1e6, 6)
          .as("llr_per_feat"))
  }

  /** Gumbel top-k importance resample: keep the k documents with the
    * largest round(llr_per_feat/T + g, 6) where g = −ln(−ln(u)) and u is
    * a deterministic 60-bit md5 draw keyed on (seed, doc_id) — by the
    * Gumbel-max theorem this samples k documents without replacement with
    * probability ∝ exp(llr_per_feat/T). T → 0 degenerates to hard top-k
    * by score; large T approaches uniform. Zero-feature documents carry
    * no evidence either way and are excluded (documented; filter first if
    * they should be kept). The per-FEATURE average (not the raw sum) is
    * the ranking score so document length does not swamp domain fit.
    */
  def resample(raw: DataFrame, target: DataFrame, k: Int,
               buckets: Int = 4096, temperature: Double = 1.0,
               seed: Long = 42L, textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val u = (conv(substring(md5(concat(lit("dsir:"), lit(seed.toString),
        lit(":"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("double") + 0.5d) / 1.152921504606846976e18d
    scores(raw, target, buckets, textCol)
      .where(col("n_feats") > 0)
      .withColumn("gkey",
        round(col("llr_per_feat") / temperature - log(-log(u)), 6))
      .orderBy(col("gkey").desc, col("doc_id").asc)
      .limit(k)
      .select("doc_id", "n_feats", "llr_per_feat", "gkey")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term salience: TF-IDF top-k terms per document and
  * corpus-wide heavy hitters. Complements the per-document signals in
  * [[TextAnalysis]] — these operators aggregate across the corpus, so
  * their scale shape is shuffles on the term key, not a pure scan.
  *
  * 100 TB design notes:
  *  - per-(doc, term) counts partial-aggregate map-side before the
  *    (doc_id, term) shuffle, so the wire volume is the distinct term
  *    count per doc, not the token stream;
  *  - document frequency is a second partial aggregate down to one row
  *    per vocabulary term — small enough that AQE usually broadcasts
  *    the join back (vocabulary grows sublinearly with corpus size);
  *    skewed hot terms ("the") stay safe because the df side is one
  *    row per term and AQE splits skewed shuffle partitions;
  *  - heavy hitters is TakeOrdered over the aggregated vocabulary —
  *    no global sort is materialized.
  */
object Salience {

  /** Per-(doc, term) occurrence counts over normalized whitespace
    * tokens; empty tokens dropped.
    */
  def termCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Document frequency per term (input is one row per (doc, term)). */
  def docFrequency(termCountsDf: DataFrame): DataFrame =
    termCountsDf.groupBy("term").agg(count(lit(1)).as("df"))

  /** Top-k salient terms per document by TF-IDF, idf = ln(N / df).
    * Scores are rounded to 6dp BEFORE ranking so the (score desc,
    * term asc) order is reproducible across engines; terms present in
    * every document score 0 and rank behind everything else.
    */
  def tfidfTopK(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    // eager fill: tc feeds both the df aggregate and the join-back; an
    // unfilled cache referenced by two subtrees evaluates twice
    val tc = termCounts(docs, textCol).cache()
    tc.count()
    val dfreq = docFrequency(tc)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tc.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  /** Tokenizer-prep vocabulary: the corpus token census filtered to
    * terms with ≥ `minCount` occurrences, id-assigned in deterministic
    * rank order (frequency desc, term asc — the conventional "most
    * frequent gets the smallest id" layout), optionally truncated to
    * `maxSize`. One partial-aggregated shuffle builds the census.
    * Output: (token_id starting at 0, term, freq, doc_freq).
    *
    * The global rank is TWO-PHASE, never a single-partition window (a
    * web-scale vocabulary is 10⁸+ terms — one task must not sort it):
    * range-partition the census into `shards` CONTIGUOUS slices of the
    * (freq desc, term asc) order, rank within each shard in parallel,
    * then add per-shard offsets from a driver-collected ≤`shards`-row
    * count table (the [[Shuffle.permutation]] shape with the offset
    * join collapsed to a broadcast map-literal lookup). Contiguity of
    * the range slices makes shard-local rank + offset ≡ the global
    * row_number, and the census term key is unique so the order is
    * strict — no boundary ties to split.
    */
  def vocabulary(docs: DataFrame, minCount: Long = 2, maxSize: Int = 0,
                 textCol: String = "text", shards: Int = 32): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val census = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("freq"), count_distinct(col("doc_id")).as("doc_freq"))
      .where(col("freq") >= minCount)
    // contiguous slices of the global order; cached so the count pass and
    // the rank pass see the SAME sampled range bounds (eager fill, same
    // rationale as tfidfTopK)
    val sharded = census
      .repartitionByRange(shards, col("freq").desc, col("term").asc)
      .withColumn("_shard", spark_partition_id())
      .cache()
    val counts = sharded.groupBy("_shard").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offLookup: Column =
      if (offsets.isEmpty) lit(0L) // empty census: no rows to rank anyway
      else element_at(
        map(offsets.flatMap { case (s, off) => Seq(lit(s), lit(off)) }: _*),
        col("_shard"))
    val w = Window.partitionBy("_shard")
      .orderBy(col("freq").desc, col("term").asc)
    val ranked = sharded
      .withColumn("token_id",
        offLookup + (row_number().over(w) - 1).cast("long"))
      .select("token_id", "term", "freq", "doc_freq")
    if (maxSize > 0) ranked.where(col("token_id") < maxSize) else ranked
  }

  /** Zipf-law fit over the [[vocabulary]] census: least-squares slope of
    * ln(freq) on ln(rank) — the corpus-health fingerprint (natural text
    * sits near −1; template/boilerplate-heavy corpora flatten, spam
    * steepens). Points are MILLI-rounded logs (3dp — slope precision
    * ~1e-3, and Σx·y stays long-exact to ~10⁷ vocabulary terms where
    * micro units would overflow); the normal-equation sums are exact
    * longs and slope/intercept are one double chain each, so the oracle
    * replays the regression bit-for-bit. Census-grain throughout.
    * Output one row: (n_terms, slope, intercept).
    */
  def zipfFit(docs: DataFrame, minCount: Long = 2, textCol: String = "text",
              shards: Int = 32): DataFrame = {
    val pts = vocabulary(docs, minCount, 0, textCol, shards)
      .select(
        round(log((col("token_id") + 1).cast("double")) * 1e3)
          .cast("long").as("x"),
        round(log(col("freq").cast("double")) * 1e3).cast("long").as("y"))
    pts
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("n_terms"),
        // n·Σxy etc. would overflow long beyond ~10⁵ terms — each exact
        // long enters the ONE double chain individually
        round((col("n").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy"))
          / (col("n").cast("double") * col("sxx")
            - col("sx").cast("double") * col("sx")), 6).as("slope"),
        round((col("sy").cast("double")
          - (col("n").cast("double") * col("sxy")
            - col("sx").cast("double") * col("sy"))
            / (col("n").cast("double") * col("sxx")
              - col("sx").cast("double") * col("sx")) * col("sx"))
          / col("n") / 1e3, 6).as("intercept"))
  }

  /** Bigram collocations by pointwise mutual information — the classic
    * phrase-mining step (PMI ≫ 0 ⇒ the pair co-occurs far above chance:
    * "new york", "machine learning"). PMI = ln(p(ab) / (p(a)·p(b))) with
    * p(ab) = c_ab/B over adjacent-pair occurrences and p(x) = c_x/N over
    * tokens; `minCount` drops unstable rare pairs BEFORE the join, so
    * the unigram join-back only touches surviving pairs.
    *
    * Scale shape: two partial-aggregated censuses (bigram, unigram) +
    * one join keyed on the two terms of each surviving bigram; totals
    * ride along as broadcast one-row frames. The ratio is computed in a
    * fixed multiplication order and rounded to 6dp so both engines agree
    * bit-for-bit. Output: (term_a, term_b, c_ab, pmi).
    */
  def bigramPmi(docs: DataFrame, minCount: Long = 5,
                textCol: String = "text"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val uni = docs.select(
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("t"))
      .where(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    val nTot = uni.agg(sum(col("c")).as("n"))
    // adjacent pairs via the 2-gram shingle expression; sub-2-token docs
    // collapse to a whole-text "shingle" with no space — not a bigram
    val bigAll = docs.select(explode(Dedup.shingles(col(textCol), 2)).as("g"))
      .where(size(split(col("g"), " ")) === 2)
      .groupBy("g").agg(count(lit(1)).as("c_ab"))
    val bTot = bigAll.agg(sum(col("c_ab")).as("b"))
    bigAll.where(col("c_ab") >= minCount)
      .select(split(col("g"), " ").getItem(0).as("term_a"),
        split(col("g"), " ").getItem(1).as("term_b"), col("c_ab"))
      .join(uni.select(col("t").as("term_a"), col("c").as("_ca")), Seq("term_a"))
      .join(uni.select(col("t").as("term_b"), col("c").as("_cb")), Seq("term_b"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(bTot))
      .withColumn("pmi",
        // both factors cast to double FIRST: a long-typed denominator
        // product would overflow at corpus scale (b·c_a·c_b > 2⁶³ once
        // token counts pass ~10¹²) — and the oracle mirrors the same
        // cast placement so the float ops replay in order
        round(log(col("c_ab").cast("double") * col("n") * col("n")
          / (col("b").cast("double") * col("_ca") * col("_cb"))), 6))
      .select("term_a", "term_b", "c_ab", "pmi")
  }

  /** Corpus-wide top-k tokens by total frequency, ties broken by term.
    * Partial aggregation collapses the token stream map-side; the final
    * top-k is TakeOrdered (no full sort/exchange of the vocabulary).
    */
  def heavyHitters(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    docs.select(
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(k)

  /** Count-min sketch over the corpus token stream — the SUBLINEAR-STATE
    * twin of [[heavyHitters]]: the exact census needs a vocabulary-sized
    * aggregation state, the sketch needs O(1/eps · log 1/conf) counters
    * no matter how unbounded the vocabulary (web-crawl tails, n-gram
    * streams). Guarantees: estimate ≥ true count always, ≤ true + eps·N
    * with probability `confidence` — and sketches with identical
    * (eps, confidence, seed) MERGE EXACTLY (counter addition), so
    * shard/day sketches fold like the HLL cards in
    * [[CorpusStats.mergeCards]]. Returns the serialized sketch bytes
    * (one row); [[cmsEstimates]] reads them driver-side.
    */
  def tokenSketch(docs: DataFrame, eps: Double = 0.001,
                  confidence: Double = 0.99, seed: Int = 42,
                  textCol: String = "text"): Array[Byte] =
    docs.select(
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .agg(count_min_sketch(col("term"), lit(eps), lit(confidence),
        lit(seed)).as("sk"))
      .head().getAs[Array[Byte]](0)

  /** Driver-side point estimates from a serialized sketch. */
  def cmsEstimates(sketch: Array[Byte], terms: Seq[String]): Map[String, Long] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(sketch)
    terms.map(t => t -> cms.estimateCount(t)).toMap
  }

  /** Exact merge of same-parameter sketches (counter addition). */
  def mergeSketches(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "need at least one sketch")
    val merged = org.apache.spark.util.sketch.CountMinSketch.readFrom(sketches.head)
    sketches.tail.foreach(b => merged.mergeInPlace(
      org.apache.spark.util.sketch.CountMinSketch.readFrom(b)))
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    out.toByteArray
  }

  /** Vocabulary coverage curve — what fraction of the corpus token
    * stream the top-S vocabulary entries cover, for a grid of
    * candidate sizes: the empirical answer to "how big must the vocab
    * be" (the knee of this curve IS the vocab-size decision, and
    * 1 − coverage is the OOV/byte-fallback rate a tokenizer will pay).
    * Built on [[vocabulary]]'s deterministic ranking (two-phase, no
    * global window); the grid multiplies the VOCABULARY census, not
    * the corpus. Output: (size, covered, total, coverage).
    */
  def vocabCoverage(docs: DataFrame,
                    sizes: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L,
                      64L, 128L, 256L, 512L, 1024L),
                    textCol: String = "text",
                    shards: Int = 32): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1), s"bad size grid: $sizes")
    val vocab = vocabulary(docs, minCount = 1, maxSize = 0, textCol, shards)
      .select(col("token_id"), col("freq"))
    val tot = vocab.agg(coalesce(sum(col("freq")), lit(0L)).as("total"))
    vocab
      .select(col("token_id"), col("freq"),
        explode(array(sizes.map(lit): _*)).as("size"))
      .where(col("token_id") < col("size"))
      .groupBy("size")
      .agg(sum(col("freq")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("size"), col("covered"), col("total"),
        round(col("covered").cast("double") / col("total"), 6)
          .as("coverage"))
  }

  /** Frequent-items (Misra–Gries/SpaceSaving) sketch over the corpus
    * token stream — the deterministic-bound twin of [[tokenSketch]]:
    * true count ∈ [lb, ub] unconditionally, ub − lb ≤ ~3.5·N/maxMapSize,
    * state O(maxMapSize) for any vocabulary. One partial-aggregated
    * scan; the shuffle carries sketch bytes.
    */
  def freqTokenSketch(docs: DataFrame, maxMapSize: Int = 1024,
                      textCol: String = "text"): Array[Byte] =
    docs.select(
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .agg(graft.functions.FreqSketch.freqAgg(col("term"), maxMapSize).as("sk"))
      .head().getAs[Array[Byte]](0)

  /** Driver-side (estimate, lowerBound, upperBound) per term. */
  def freqEstimates(sketch: Array[Byte],
                    terms: Seq[String]): Map[String, (Long, Long, Long)] = {
    val sk = graft.functions.FreqSketch.wrap(sketch)
    terms.map(t =>
      t -> ((sk.getEstimate(t), sk.getLowerBound(t), sk.getUpperBound(t)))).toMap
  }

  /** Frequent items above the sketch's error line — NO_FALSE_NEGATIVES
    * returns a superset of every item with true count > maximumError.
    */
  def freqHitters(sketch: Array[Byte]): Seq[(String, Long)] = {
    val sk = graft.functions.FreqSketch.wrap(sketch)
    sk.getFrequentItems(
        org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
      .map(r => r.getItem -> r.getEstimate).toSeq
  }

  /** Merge same-family frequent-items sketches (no re-scan). */
  def mergeFreqSketches(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "need at least one sketch")
    val merged = graft.functions.FreqSketch.wrap(sketches.head)
    sketches.tail.foreach(b =>
      merged.merge(graft.functions.FreqSketch.wrap(b)))
    merged.toByteArray(graft.functions.FreqSketch.serde)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over the corpus — the lexical ranking half
  * of a RAG / hard-negative-mining pipeline (Robertson–Walker Okapi
  * BM25, the function every Lucene/Elasticsearch deployment defaults
  * to). Beyond-reference surface (SURVEY §2.13): complements the
  * embedding retrieval in [[Similarity]] — production retrieval stacks
  * run both and fuse.
  *
  * score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene variant,
  * non-negative by construction).
  *
  * Engine portability: each (query, doc, term) contribution is computed
  * in one fixed float-op order and rounded to integer MICRO units
  * (round(·1e6) — the [[TextAnalysis.unigramLogProb]] trick), so the
  * per-pair sum is exact integer arithmetic and ranking is
  * order-independent; ranks tiebreak on doc_id asc.
  *
  * 100 TB shape: the postings list (doc census keyed by term) is built
  * once with map-side partial aggregation; query terms equi-join onto it
  * — an inverted-index join, never a doc×query product. Ubiquitous
  * terms ("the") would fan out |q|×N rows while contributing ~zero idf,
  * so `maxDfFrac` drops postings for terms in more than that fraction
  * of documents BEFORE the join — the same structural hot-key answer as
  * [[Decontaminate]]'s `maxDf` stop-shingle cap (on by default, 0.5;
  * set ≥ 1.0 to opt out and lean on AQE skew-split alone). Per-query
  * top-k is a window over the query partition: candidates per query are
  * df-bounded postings, so no global sort and no single-partition
  * window appears anywhere.
  */
object Retrieval {

  /** Top-k documents per query by BM25. `docs` = (doc_id, textCol);
    * `queries` = (query_id, textCol). Output: (query_id, doc_id,
    * score_micro, score, rank) — `score` is the 6 dp rendering of the
    * exact micro sum.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDfFrac: Double = 0.5,
               textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    // postings: per-(doc, term) tf; reused for df, dl, and the join —
    // eager-cached because three subtrees consume it
    val tc = Salience.termCounts(docs, textCol).cache()
    tc.count()
    val dfreq = Salience.docFrequency(tc)
    val dl = tc.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(avg(col("dl")).as("avgdl")))
    val qTerms = queries.select(col("query_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("term"))
      .where(col("term") =!= "")
      .distinct()
    // stop-term cap: drop postings for terms in > maxDfFrac of docs
    val postings0 = tc.join(dfreq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    val postings =
      if (maxDfFrac >= 1.0) postings0
      else postings0.where(col("df") <= col("n_docs").cast("double") * maxDfFrac)
    val contrib = postings
      .join(qTerms, Seq("term"))
      // fixed float-op order, one micro round at the end — the oracle
      // replays the identical expression tree
      .withColumn("c_micro",
        round(
          log((col("n_docs").cast("double") - col("df") + 0.5d)
              / (col("df").cast("double") + 0.5d) + 1.0d)
            * (col("tf").cast("double") * (k1 + 1.0d))
            / (col("tf").cast("double")
              + lit(k1) * (lit(1.0d - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
          * 1e6).cast("long"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("c_micro")).as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score_micro"),
        round(col("score_micro").cast("double") / 1e6, 6).as("score"),
        col("rank"))
  }

  /** Vector-space-model retrieval (tf-idf cosine, Salton's classic) —
    * the third lexical scorer next to [[bm25TopK]] and
    * [[phraseSearch]]: w(t) = tf · (ln((N+1)/(df+1)) + 1) (smooth idf,
    * positive by construction), score = cos(w_q, w_d). Weights are
    * micro-quantized per (doc, term) BEFORE any sum, so dot products
    * and squared norms are EXACT integer arithmetic (headroom: w_micro
    * ≲ 10⁸ per term ⇒ Σw² < 2⁶³ to ~10⁷ distinct terms per doc) — the
    * cosine is one double chain over three exact longs, bit-replayable.
    * Query terms weight against CORPUS statistics (the standard VSM
    * contract). Same inverted-index join + `maxDfFrac` stop-term cap
    * as BM25; per-query top-k windows partition on query_id.
    *
    * Output: (query_id, doc_id, cosine, rank).
    */
  def vsmTopK(docs: DataFrame, queries: DataFrame, k: Int,
              maxDfFrac: Double = 0.5,
              textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tc = Salience.termCounts(docs, textCol).cache()
    tc.count()
    val dfreq = Salience.docFrequency(tc)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs").cast("double") + 1.0d)
      / (col("df").cast("double") + 1.0d)) + 1.0d
    val wd = tc.join(dfreq, "term").crossJoin(broadcast(stats))
      .withColumn("w_micro",
        round(col("tf").cast("double") * idf * 1e6).cast("long"))
      .select("doc_id", "term", "w_micro", "df", "n_docs")
    val dnorm = wd.groupBy("doc_id")
      .agg(sum(col("w_micro") * col("w_micro")).as("d2"))
    val qc = Salience.termCounts(
      queries.select(col("query_id").as("doc_id"), col(textCol)), textCol)
      .select(col("doc_id").as("query_id"), col("term"), col("tf"))
    val wq = qc.join(dfreq, "term").crossJoin(broadcast(stats))
      .withColumn("q_micro",
        round(col("tf").cast("double") * idf * 1e6).cast("long"))
      .select("query_id", "term", "q_micro")
    val qnorm = wq.groupBy("query_id")
      .agg(sum(col("q_micro") * col("q_micro")).as("q2"))
    val capped =
      if (maxDfFrac >= 1.0) wd
      else wd.where(col("df") <= col("n_docs").cast("double") * maxDfFrac)
    val dot = capped.join(wq, Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("w_micro") * col("q_micro")).as("dot"))
    val scored = dot
      .join(dnorm, Seq("doc_id"))
      .join(qnorm, Seq("query_id"))
      .withColumn("cosine",
        round(col("dot").cast("double")
          / (sqrt(col("d2").cast("double")) * sqrt(col("q2").cast("double"))),
          6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "doc_id", "cosine", "rank")
  }

  /** Reciprocal-rank fusion (Cormack et al.) — the standard way a RAG
    * stack combines lexical ([[bm25TopK]]) and semantic
    * ([[Similarity.bruteForceTopK]] / ANN) result lists WITHOUT
    * comparable scores: fused(d) = Σ_systems 1/(k0 + rank_s(d)).
    * Each input carries (query_id, doc_id, rank); documents absent from
    * a system simply contribute no term.
    *
    * Portability: each reciprocal is one double division rounded to
    * integer MICRO units before the per-(query, doc) sum — the usual
    * exact-integer trick, so fusing any number of systems stays
    * association-order-free and the oracle replays it.
    *
    * 100 TB shape: inputs are already top-k lists (≤ k rows per query
    * per system), so the union + one partial-agg shuffle on
    * (query_id, doc_id) is bounded by queries·systems·k, not corpus
    * size; the final per-query window partitions on query_id.
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(topK >= 1 && k0 >= 0, s"bad fusion params topK=$topK k0=$k0")
    val terms = rankings
      .map(_.select(col("query_id"), col("doc_id"),
        round(lit(1.0d) / (lit(k0).cast("double") + col("rank")) * 1e6)
          .cast("long").as("_r")))
      .reduce(_ unionByName _)
    val fused = terms.groupBy("query_id", "doc_id")
      .agg(sum(col("_r")).as("rrf_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rrf_micro"),
        round(col("rrf_micro").cast("double") / 1e6, 6).as("rrf_score"),
        col("rank"))
  }

  /** Exact phrase search over a POSITIONAL inverted index — the
    * "quoted query" feature BM25's bag-of-words scoring cannot express:
    * a doc matches where its terms appear CONSECUTIVELY in query
    * order.
    *
    * Shape (round 9, guide §2.3/§2.4): the candidate pass is classic
    * positional-postings algebra — each query anchors on its RAREST
    * term, so candidates are bounded by that term's df — but the
    * verification pass is DOC-GRAIN, not token-grain: the doc's token
    * array is sliced at the candidate base and compared to the query's
    * token array in one equi-join on doc_id. The previous plan shuffled
    * the ENTIRE corpus token stream by a (doc, term, pos) 3-part key
    * and re-counted matched offsets per candidate (two more exchanges
    * + an aggregation); slice-equality is the same check with the
    * tokens moving once, as arrays, on the 1-part key.
    *
    * Output: (query_id, doc_id, n_hits — phrase occurrence count,
    * rank ≤ topK by (n_hits desc, doc_id asc)).
    *
    * 100 TB shape: one tokenize pass (the checkpointed doc-grain token
    * arrays feed the df census, the anchor join and the verification);
    * query-side frames are panel-sized and broadcast; the only
    * corpus-scale shuffles are the postings census and the doc_id
    * verification join, whose probe side the rarest-term df bounds.
    * Queries are one row per query_id (same contract as before — the
    * offset-count check assumed it too).
    */
  def phraseSearch(queries: DataFrame, docs: DataFrame, topK: Int,
                   textCol: String = "text"): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val docToks = docs.select(col("doc_id"),
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))).as("dtoks"))
      .localCheckpoint()
    val postings = docToks.select(col("doc_id"),
      posexplode(col("dtoks")).as(Seq("pos", "term")))
    val qArr = queries.select(col("query_id"),
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))).as("qtoks"))
      .localCheckpoint()
    val qterms = qArr.select(col("query_id"),
      posexplode(col("qtoks")).as(Seq("off", "term")))
    // The classic phrase-query optimization: anchor each query on its
    // RAREST term (postings census join + per-query argmin), so the
    // candidate set is bounded by that term's df — not the sum of every
    // query term's postings, which for common-word phrases is the whole
    // corpus token stream.
    val tdf = postings.groupBy("term").agg(count(lit(1)).as("_df"))
    val wRare = Window.partitionBy(col("query_id"))
      .orderBy(col("_df").asc, col("off").asc)
    val anchorTerm = qterms.join(tdf, "term")
      .withColumn("_rn", row_number().over(wRare))
      .where(col("_rn") === 1)
      .select(col("query_id"), col("term"), col("off").as("_aoff"))
    val anchors = anchorTerm.join(postings, "term")
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("_aoff")).as("base"))
      .where(col("base") >= 0)
    // verify: the doc's token slice at base must equal the whole query
    // array (slice is 1-based; a slice running past the end comes back
    // short and the equality fails, which is exactly the old
    // matched-offsets-out-of-range behavior)
    val hits = anchors
      .join(qArr, Seq("query_id"))
      .join(docToks, Seq("doc_id"))
      .where(slice(col("dtoks"), col("base") + 1, size(col("qtoks")))
        === col("qtoks"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_hits").desc, col("doc_id").asc)
    hits.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }

  /** nDCG@k — the oracle-checkable retrieval-EVALUATION metric (the
    * recall harnesses self-assert; this one hash-replays): DCG with the
    * standard 2^rel−1 gains and 1/log₂(rank+1) discounts, normalized by
    * the ideal ordering of the SAME judgment set. Discounts are
    * micro-rounded per rank (one libm chain each), gains exact integers
    * — the per-query sums are exact long arithmetic. Unjudged retrieved
    * docs earn rel 0. Windows partition by query (judgment pools are
    * per-query bounded). Input: `ranked` = (query_id, doc_id, rank),
    * `judgments` = (query_id, doc_id, rel ≥ 0). Output: (query_id,
    * dcg_micro, idcg_micro, ndcg).
    */
  def ndcgAt(ranked: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def disc = round(lit(1e6) /
      (log(col("rank").cast("double") + 1.0d) / log(lit(2.0d)))).cast("long")
    def gain =
      expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT)) - CAST(1 AS BIGINT)")
    val dcg = ranked.where(col("rank") <= k)
      .join(judgments, Seq("query_id", "doc_id"), "left_outer")
      .na.fill(0L, Seq("rel"))
      .withColumn("_t", gain * disc)
      .groupBy("query_id").agg(sum(col("_t")).as("dcg_micro"))
    val wI = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("doc_id").asc)
    val idcg = judgments
      .withColumn("rank", row_number().over(wI))
      .where(col("rank") <= k)
      .withColumn("_t", gain * disc)
      .groupBy("query_id").agg(sum(col("_t")).as("idcg_micro"))
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0,
          round(col("dcg_micro").cast("double") / col("idcg_micro"), 6))
          .as("ndcg"))
  }
}

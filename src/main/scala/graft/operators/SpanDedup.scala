package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level repeated-SPAN removal — the "remove any ≥k-token
  * substring that appears twice in the corpus" policy from the
  * dedup-training-data literature, computed by k-window coverage. A
  * k-token window whose text occurs more than once ANYWHERE in the
  * corpus (across docs or within one) is a repeated window; every token
  * covered by at least one repeated window is dropped and the survivors
  * are reassembled in order.
  *
  * Window coverage is EXACT for this policy, not an approximation: a
  * token sits inside some repeated span of length ≥ k iff it is covered
  * by a repeated k-window. (⇒ a span of length L ≥ k occurring twice
  * repeats each of its L−k+1 k-windows, which jointly cover all L
  * tokens; ⇐ a repeated k-window is itself a repeated span of length k.)
  * What suffix-array implementations (ExactSubstr et al.) buy is
  * byte-granular span boundaries and memory locality, not a different
  * token-level removal set. Two policies are offered: the default drops
  * EVERY occurrence of duplicated content; `keepFirst = true` exempts
  * the corpus-first occurrence of each repeated WINDOW (the literature's
  * "remove all but one copy" direction). The implemented rule is: a
  * token is removed iff SOME non-canonical repeated window covers it.
  * For repeated spans that don't overlap other repeated content this
  * preserves exactly the corpus-first copy; where DISTINCT repeated
  * windows overlap, a canonical window's token can still be removed by
  * an overlapping non-canonical window — e.g. docs "p q a b" / "a b c" /
  * "z b c w" at k=2: the canonical "b c" in doc 2 loses its "b" to the
  * overlapping non-canonical "a b", so no intact "b c" survives. A
  * guarantee of one intact copy per span would need conflict resolution
  * across overlapping window families (iterative, order-dependent);
  * this one-pass rule is deterministic and oracle-replayable instead.
  *
  * Differs from the line-grain [[Boilerplate]] census (whole lines only)
  * and from [[Decontaminate]] (containment REPORTING, not removal): this
  * edits inside documents at token granularity.
  *
  * Scale shape: the window census is one partial-aggregated shuffle of
  * 16-byte digests; duplicate positions come back via an equi-join on
  * the digest; coverage explode is a bounded ×k fan-out of only the
  * DUPLICATED windows; reassembly is one groupBy(doc_id) with a sorted
  * collect_list (token order restored explicitly — collect_list order is
  * not a contract). No all-pairs anything. Documents route through an
  * edited/untouched split keyed on doc_id: only edited docs pay the
  * token explode + regroup, while untouched docs pass through one
  * doc_id anti-join. The MATERIALIZED state is the covered (doc_id,
  * pos) frame — bounded by the DUPLICATED token volume, which on a
  * boilerplate-saturated corpus approaches one row per corpus token:
  * executor memory/disk must cover it, and under the default
  * localCheckpoint (lineage truncated) losing an executor holding its
  * blocks fails the query rather than recomputing — pass
  * `reliable = true` to checkpoint the frame to a fault-tolerant
  * directory instead when executor churn is expected. On clean corpora
  * it is small and the derived affected-id joins broadcast under AQE.
  *
  * Reassembly joins tokens with single spaces, i.e. original whitespace
  * is normalized — the standard contract for token-level editing.
  */
object SpanDedup {

  /** (doc_id, clean_text, n_tokens, n_removed).
    *
    * @param k window length in tokens; docs shorter than k tokens are
    *          never edited (no window of length k exists in them)
    * @param keepFirst false (default): every occurrence of duplicated
    *          content is dropped. true: the lexicographically-first
    *          (doc_id, position) occurrence of each repeated window does
    *          not contribute coverage — a token is removed iff some
    *          NON-canonical repeated window covers it (see the object
    *          scaladoc for the overlap fine print). The canonical
    *          occurrence comes from a min(struct) aggregate over the
    *          (small) repeated-window frame — partial-aggregates
    *          map-side, no per-digest sort.
    * @param reliable how the covered-position frame is materialized.
    *          false (default): `localCheckpoint` — executor-local blocks,
    *          fastest, but losing an executor holding blocks FAILS the
    *          query (lineage is truncated; acceptable for interactive /
    *          small runs). true: `checkpoint` to the session's configured
    *          checkpoint directory (`sparkContext.setCheckpointDir` — an
    *          hdfs/s3a/gs path at scale), so a 100 TB run with executor
    *          churn recovers by re-reading the checkpoint instead of
    *          dying; costs one write + read of the covered frame through
    *          the checkpoint store.
    */
  def removeRepeatedSpans(docs: DataFrame, k: Int = 8,
                          textCol: String = "text",
                          keepFirst: Boolean = false,
                          reliable: Boolean = false): DataFrame = {
    require(k >= 2, s"span window must be at least 2 tokens, got $k")
    require(!reliable ||
      docs.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "removeRepeatedSpans(reliable = true) needs a checkpoint directory: " +
        "call spark.sparkContext.setCheckpointDir(<fault-tolerant path>) first")
    // kernelTokens, NOT tokens: window positions come from the shingle
    // kernel (full whitespace trim), so token positions must use the
    // SAME tokenization — Spark trim's phantom empty token on a leading
    // newline would shift every edit offset by one and defeat the
    // short-doc guard.
    val toksCol = TextAnalysis.kernelTokens(col(textCol))

    // windows in position order: shingle index IS the start position.
    // The < k guard matters — NGramShingles collapses shorter inputs to
    // one whole-text shingle, which would wrongly let a short doc's full
    // text census-match a window of a longer doc.
    // wins feeds both the census and the duplicate-position join; when
    // AQE broadcasts the small repeated-digest side, the probe side
    // bypasses the census's exchange and ReuseExchange no longer dedups
    // the shingle pass — materialize once (lazy local checkpoint,
    // computed in the query's first job): (doc_id, wpos, 16-byte dig)
    // rows, bounded by the corpus window volume.
    val wins = docs
      .select(col("doc_id"),
        when(size(toksCol) >= k,
          graft.functions.NGramShingles.shingles(col(textCol), k))
          .otherwise(array().cast("array<string>")).as("wins"))
      .select(col("doc_id"), posexplode(col("wins")).as(Seq("wpos", "w")))
      .select(col("doc_id"), col("wpos"), md5(col("w")).as("dig"))
      .localCheckpoint(false)

    val repeated = wins.groupBy("dig").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("dig")
    // covered is THE fan-in point: the affected-id set, the reassembly
    // anti-join, and the untouched anti-join all derive from it, and
    // each reference would otherwise re-run the whole shingle census
    // (exchange reuse dedups shuffles, not the aggregates above them).
    // Materialize it once — (doc_id, pos) int pairs bounded by the
    // DUPLICATED token volume; blocks are freed by the ContextCleaner
    // with the returned frame.
    val dupWins = wins.join(repeated, Seq("dig"))
    val coveringWins =
      if (!keepFirst) dupWins
      else {
        // canonical occurrence per digest: the lexicographic minimum —
        // min(struct) partial-aggregates, unlike a row_number window
        val canon = dupWins.groupBy("dig")
          .agg(min(struct(col("doc_id"), col("wpos"))).as("_first"))
        dupWins.join(canon, Seq("dig"))
          .where(struct(col("doc_id"), col("wpos")) =!= col("_first"))
      }
    val coveredPlan = coveringWins
      .select(col("doc_id"),
        explode(sequence(col("wpos"), col("wpos") + lit(k - 1))).as("pos"))
      .distinct()
    val covered =
      if (reliable) coveredPlan.checkpoint(true)
      else coveredPlan.localCheckpoint(true)

    // only AFFECTED docs (≥1 repeated window) pay the token explode +
    // regroup; at scale the overwhelming majority of docs have no
    // repeated span and pass through one doc_id anti-join. Both paths
    // emit the same contract (tokens joined by single spaces). The
    // affected-id distinct runs over the MATERIALIZED covered frame, so
    // its three join references cost three small id shuffles, never a
    // census re-run.
    val affected = covered.select("doc_id").distinct()
    val toks = docs.join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(toksCol).as(Seq("pos", "tok")))
    val rebuilt = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        TextAnalysis.joinInOrder(col("pos"), col("tok"), " ").as("clean_text"))
    val edited = docs.join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), size(toksCol).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    // kernelTokens maps null text to an empty array, so array_join here
    // keeps the non-null clean_text contract the edited path enforces
    // via coalesce
    val untouched = docs.join(affected, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        array_join(toksCol, " ").as("clean_text"),
        size(toksCol).cast("long").as("n_tokens"),
        lit(0L).as("n_removed"))
    edited.unionByName(untouched)
  }

  /** Maximal repeated spans — the VARIABLE-LENGTH layer over the fixed-k
    * census: instead of (or before) removing, REPORT each maximal run of
    * duplicated content per document with its true token length and text.
    * This is what suffix-array pipelines (ExactSubstr et al.) emit; here
    * the same spans fall out of the k-window census by coalescing
    * overlapping repeated windows: a maximal repeated span of length
    * L ≥ k is exactly a maximal island of consecutive covered positions
    * (each of its L−k+1 k-windows repeats, jointly covering all L
    * tokens; conversely an island's every position lies in some repeated
    * window, and maximality ends the island where coverage ends). So the
    * report is EXACT at token granularity for the ≥k policy — no second
    * pass over larger k needed.
    *
    * Scale shape: census + coverage explode as in
    * [[removeRepeatedSpans]]; the island merge is one window function
    * (row_number per doc over covered positions — partitioned by doc_id,
    * bounded by the duplicated token volume, never the corpus), and the
    * span text resolves by slicing each affected doc's token array once
    * (left_semi-pruned join, no re-census).
    *
    * Output: (doc_id, span_start, span_len, span_text), one row per
    * maximal repeated span, span_start 0-based in kernel tokens.
    */
  def maximalRepeatedSpans(docs: DataFrame, k: Int = 8,
                           textCol: String = "text"): DataFrame = {
    require(k >= 2, s"span window must be at least 2 tokens, got $k")
    val toksCol = TextAnalysis.kernelTokens(col(textCol))
    // same single-materialization as removeRepeatedSpans (see above)
    val wins = docs
      .select(col("doc_id"),
        when(size(toksCol) >= k,
          graft.functions.NGramShingles.shingles(col(textCol), k))
          .otherwise(array().cast("array<string>")).as("wins"))
      .select(col("doc_id"), posexplode(col("wins")).as(Seq("wpos", "w")))
      .select(col("doc_id"), col("wpos"), md5(col("w")).as("dig"))
      .localCheckpoint(false)
    val repeated = wins.groupBy("dig").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("dig")
    val covered = wins.join(repeated, Seq("dig"))
      .select(col("doc_id"),
        explode(sequence(col("wpos"), col("wpos") + lit(k - 1))).as("pos"))
      .distinct()
    // gaps-and-islands: consecutive covered positions share pos − rank.
    // The window partitions by doc_id over the covered frame only —
    // per-doc state is the doc's duplicated positions, not its tokens.
    val isl = covered.withColumn("_g",
      col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val spans = isl.groupBy(col("doc_id"), col("_g"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        count(lit(1)).as("span_len"))
    val affectedToks = docs
      .join(spans.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), toksCol.as("_toks"))
    spans.join(affectedToks, Seq("doc_id"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
        array_join(slice(col("_toks"), (col("span_start") + 1).cast("int"),
          col("span_len").cast("int")), " ").as("span_text"))
  }

  /** Split documents into fixed-size token chunks with overlap — the
    * context-window preparation step between cleaning and
    * [[Packing.packGreedy]]: models consume ≤ maxTokens sequences, so
    * long documents become strided windows (stride = maxTokens −
    * overlap), each carrying its ordinal and span so provenance survives.
    * Final partial chunks are kept (a tail shorter than maxTokens is
    * still training data); docs at most maxTokens long yield exactly
    * one chunk. Shuffle-free: one projection computes every chunk via
    * slicing — the ×(n/stride) row fan-out is the contract, not a join.
    *
    * Output: (doc_id, chunk_id, chunk_text, chunk_start, chunk_tokens).
    */
  def chunk(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
            textCol: String = "text"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap (maxTokens=$maxTokens)")
    val stride = maxTokens - overlap
    val toksCol = TextAnalysis.kernelTokens(col(textCol))
    // chunk starts: 0, stride, 2·stride, …, stride·ceil((n−maxTokens)/stride)
    // — the last start is the first one whose window reaches the end
    docs
      .select(col("doc_id"), toksCol.as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .where(col("_n") >= 1)
      .select(col("doc_id"), col("_toks"), col("_n"),
        explode(sequence(lit(0),
          greatest(
            ceil((col("_n") - lit(maxTokens)).cast("double") / stride).cast("int"),
            lit(0)) * stride,
          lit(stride))).as("chunk_start"))
      .select(col("doc_id"),
        (col("chunk_start") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("_toks"), col("chunk_start") + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(col("_n") - col("chunk_start"), lit(maxTokens)).cast("long")
          .as("chunk_tokens"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All are pure column expressions (whole-stage codegen,
  * no UDFs) so they scan-scale linearly and push through Catalyst.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty/blank text → empty array (split of ""
    * would otherwise yield [""]).
    *
    * CAVEAT: Spark `trim` strips SPACES only, so text with a leading
    * newline/tab yields a phantom empty first token. Harmless where only
    * counts/ratios are consumed, but positional consumers must use
    * [[kernelTokens]], which agrees with the NGramShingles window
    * positions (full whitespace trim).
    */
  def tokens(text: Column): Column = {
    val t = split(trim(text), "\\s+")
    when(trim(text) === "", array().cast("array<string>")).otherwise(t)
  }

  /** Kernel tokenization ([[graft.functions.ShingleKernel]], n = 1):
    * FULL whitespace trim + \s+ split — no phantom empty tokens on
    * leading newlines, and positionally consistent with NGramShingles
    * windows (window i covers kernel tokens i..i+n−1), which is the
    * invariant [[SpanDedup]] depends on. Empty/blank input → empty array
    * (the kernel's [""] whole-text shingle for empty input is mapped
    * away).
    */
  def kernelTokens(text: Column): Column = {
    val t = graft.functions.NGramShingles.shingles(text, 1)
    // null text → empty array (not null): tokenization consumers get a
    // total function, so e.g. array_join never manufactures null text
    when(text.isNull or t === array(lit("")),
      array().cast("array<string>")).otherwise(t)
  }

  /** Aggregate expression: `value`s joined by `sep` in ascending `pos`
    * order — collect_list order is NOT a contract, the sort is what
    * restores it. Shared by every line/token reassembly
    * ([[graft.operators.Boilerplate]], [[graft.operators.SpanDedup]]).
    */
  def joinInOrder(pos: Column, value: Column, sep: String): Column =
    array_join(
      transform(array_sort(collect_list(struct(pos.as("p"), value.as("v")))),
        s => s.getField("v")), sep)

  /** BPE-ish subword count approximation: alnum runs and single
    * non-alnum/non-space marks each count as one token.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(regexp_replace(text, "([^\\p{L}\\p{N}\\s])", " $1 "), "\\s+"),
      t => t =!= ""))

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      length(col(textCol)).as("n_chars"),
      bpeishTokenCount(col(textCol)).as("n_subtokens"))
  }

  /** Quality signals: length, punctuation ratio, stopword fraction,
    * mean token length. Ratios are rounded to 6dp so results are stable
    * under cross-engine float comparison.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   stopwords: Seq[String] = EnglishStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nPunct = length(col(textCol)) - length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))
    val nStop = size(filter(toks, t => t.isInCollection(stopwords)))
    docs.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      nTok.as("n_tokens"),
      round(nPunct.cast("double") / greatest(length(col(textCol)), lit(1)), 6).as("punct_ratio"),
      round(nStop.cast("double") / greatest(nTok, lit(1)), 6).as("stopword_frac"),
      round((length(col(textCol)) - (nTok - lit(1))).cast("double") / greatest(nTok, lit(1)), 6)
        .as("mean_token_len"))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for")

  /** Marker vocabularies for the n-gram/stopword language-ID heuristic.
    * Deterministic and tiny by design — the heuristic (not a model) is the
    * operator; profiles are swappable.
    */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "我")
  )

  /** Language-ID: per-language marker-token counts (with multiplicity),
    * winner = highest count, ties broken by the fixed language order,
    * no markers at all → "und" (undetermined).
    */
  def languageId(docs: DataFrame, textCol: String = "text",
                 markers: Seq[(String, Seq[String])] = LanguageMarkers): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = markers.foldLeft(docs.select(col("doc_id"), toks.as("_toks"))) {
      case (df, (lang, words)) =>
        df.withColumn(s"_s_$lang", size(filter(col("_toks"), t => t.isInCollection(words))))
    }
    // argmax with first-wins tie-break over the declared order
    val best = markers.map(_._1).foldLeft((lit(0), lit("und"))) {
      case ((bestScore, bestLang), lang) =>
        val s = col(s"_s_$lang")
        (when(s > bestScore, s).otherwise(bestScore),
          when(s > bestScore, lit(lang)).otherwise(bestLang))
    }
    scored.select(col("doc_id"), best._2.as("lang_pred"), best._1.as("lang_score"))
  }

  /** Repetition quality signal (Gopher-style filter): the fraction of
    * duplicate word n-grams, 1 − |distinct n-grams| / |n-grams|, for
    * n = 2 and 3. High values flag boilerplate/looping text. Pure native
    * shingle expressions — codegen, no explode, grain preserved.
    */
  def repetitionScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def dupFrac(n: Int): Column = {
      val all = graft.functions.NGramShingles.shingles(
        normalized(col(textCol)), n, distinct = false)
      round(lit(1.0) - size(array_distinct(all)).cast("double")
        / greatest(size(all), lit(1)), 6)
    }
    docs.select(col("doc_id"),
      dupFrac(2).as("dup_2gram_frac"),
      dupFrac(3).as("dup_3gram_frac"))
  }

  /** Compression-ratio quality signal: deflate(text) length / raw
    * length — the RefinedWeb/CCNet-family heuristic that catches BOTH
    * tails the n-gram fractions can miss (a ratio near 0 means machine
    * repetition at any period, including ones longer than 3 tokens; a
    * ratio near 1 means high-entropy noise — neither is natural text).
    *
    * One Deflater per PARTITION, reset per row (the object allocates
    * native zlib state; per-row construction would dominate), so this
    * is a shuffle-free partition-local scan like the media decoders.
    * The byte counts are deterministic for a fixed (zlib version,
    * level) pair but NOT an engine-portable contract — the gate is
    * self-asserting (ordering invariants on engineered corpora), not
    * oracle-replayed; raw_len IS exact and externally checkable.
    * Null/empty text → ratio null (no information, not "0").
    */
  def compressionRatio(docs: DataFrame, textCol: String = "text",
                       level: Int = 6): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("raw_len", IntegerType),
      StructField("compressed_len", IntegerType),
      StructField("compression_ratio", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col("doc_id"), col(textCol))
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level, /* nowrap = */ true)
        // native zlib state is only reclaimed at GC unless end()ed — on a
        // long-lived executor running thousands of tasks that's an
        // off-heap leak, so release it when the task completes
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        rows.map { r =>
          val text = if (r.isNullAt(1)) null else r.getString(1)
          if (text == null || text.isEmpty)
            org.apache.spark.sql.Row(r.getLong(0),
              if (text == null) null else 0, null, null)
          else {
            val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var n = 0
            while (!deflater.finished()) {
              val produced = deflater.deflate(buf)
              n += produced
              // oversized outputs only need counting, not keeping
            }
            org.apache.spark.sql.Row(r.getLong(0), bytes.length, n,
              math.rint(n.toDouble / bytes.length * 1e6) / 1e6)
          }
        }
      }(enc)
  }

  /** Mojibake (double-encoded UTF-8) repair table: for every character
    * in the Latin-1 supplement plus the common Windows-1252 punctuation,
    * the garbled sequence produced by UTF-8 bytes mis-decoded as
    * Latin-1/cp1252 ("é" → "Ã©", "—" → "â€”"), paired with the true
    * character. Generated from the JDK's OWN charsets at class-init —
    * one source of truth that both the operator and the oracle
    * interpolate, so the mapping can never half-change. Longest
    * sequences first so 3-byte repairs ("â€”") never lose their tail to
    * a 2-byte rule.
    */
  val MojibakeTable: Seq[(String, String)] = {
    val latin1 = (0xA0 to 0xFF).map(_.toChar.toString)
    val cp1252Punct = Seq("‘", "’", "“", "”", "–",
      "—", "…", "€", "™", "•")
    (latin1 ++ cp1252Punct).map { c =>
      new String(c.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "windows-1252") -> c
    }.filterNot { case (bad, good) => bad == good }
      .sortBy { case (bad, _) => -bad.length }
  }

  /** Repair double-encoded UTF-8: apply the [[MojibakeTable]] as one
    * chain of literal replaces — declarative, codegen'd, shuffle-free
    * (Spark splits the ~100-replace chain across generated methods, the
    * BPE-merge-fold precedent). Idempotent on clean text: repaired
    * characters never re-match a garble sequence. The ftfy-lite subset —
    * a FULL repair (mixed encodings, triple encoding) needs byte-level
    * heuristics; this handles the dominant single-double-encoding case
    * a crawl actually contains.
    */
  def fixMojibake(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** Character-entropy quality signal — the ENGINE-PORTABLE twin of
    * [[compressionRatio]]: H = −Σ p_c·log p_c over the document's
    * character distribution catches the same two degenerate tails
    * (machine repetition → low entropy, high-entropy noise → near the
    * alphabet ceiling) but, unlike deflate byte counts, is an exact
    * cross-engine contract: each per-character term is micro-fixed
    * (n_c · round(ln(N/n_c)·1e6)) before the integer per-doc sum, and
    * the bits conversion is one fixed-order double chain rounded to 6dp.
    *
    * 100 TB shape: the char census partial-aggregates map-side to ≤
    * alphabet-size rows per (doc, partition) before the one (doc, char)
    * shuffle — the [[Salience.termCounts]] pattern at character grain.
    * Output: (doc_id, n_chars, char_entropy_bits); empty and null text
    * carry n_chars 0 with a null entropy (no information, not "0").
    *
    * Character contract: BMP code points. Spark's split("") walks UTF-16
    * units while external engines walk code points, so ASTRAL characters
    * (emoji, rare CJK extensions) count as two units here and one there
    * — identical on every BMP alphabet, divergent past it. A
    * code-point-exact variant needs a custom expression; the signal's
    * discriminative power is unaffected either way.
    */
  def charEntropy(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val census = docs
      .select(col("doc_id"), explode(split(col(textCol), "")).as("c"))
      .where(col("c") =!= "")
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
    val totals = census.groupBy("doc_id").agg(sum("n").as("n_chars"))
    val sums = census.join(totals, Seq("doc_id"))
      .select(col("doc_id"),
        (col("n") * round(log(col("n_chars").cast("double") / col("n")) * 1e6)
          .cast("long")).as("t_micro"))
      .groupBy("doc_id").agg(sum("t_micro").as("h_sum_micro"))
    docs.select("doc_id")
      .join(totals.join(sums, Seq("doc_id")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        // exact integer sum → bits in ONE fixed-order double chain
        round(col("h_sum_micro").cast("double") / 1e6 / col("n_chars")
          / lit(0.6931471805599453d), 6).as("char_entropy_bits"))
  }

  /** PII redaction: emails, IPv4 addresses, and xxx-xxx-xxxx phone
    * numbers replaced with typed placeholders. Patterns stay inside the
    * RE2 ∩ java.util.regex common subset (no lookaround, no backrefs) so
    * the exact same strings run in the DuckDB oracle — and in any engine
    * a 100 TB pipeline might mirror the scrub into.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** HTML/markup stripping for web-crawl extraction: drop script/style/
    * comment blocks WITH their content, then every remaining tag, then
    * decode the five predefined XML entities, then collapse whitespace.
    * NEWLINES SURVIVE (horizontal runs collapse to one space, newline
    * runs to one '\n') — the line structure is what the downstream
    * boilerplate line census keys on, so flattening it here would make
    * strip → boilerplate composition silently keep every footer.
    * Patterns stay in the RE2 ∩ java.util.regex subset ((?is) inline
    * flags, non-greedy — no lookaround, no backreferences), so the
    * oracle replays them verbatim. Pure codegen regexp_replace chain —
    * shuffle-free at any corpus size.
    */
  def stripMarkup(text: Column): Column = {
    // The tag/entity passes are VALUE-IDENTICAL no-ops on text without
    // BOTH '<' and '&' absent, so gate the whole sub-chain on ONE flat
    // condition over the raw input: a clean-text corpus skips two (?s)
    // regex scans and six replaces per row, while markup-bearing rows
    // pay two extra byte scans. ONE flat CASE, not nested — a nested
    // when() duplicates the inner chain across branches and codegen's
    // subexpression elimination does not hoist across conditionals
    // (measured 8.4 → 14.0 s, i.e. SLOWER, with the nested spelling).
    // The oracle's unconditional chain computes the same value by
    // construction. No backreferences (RE2 has none): script and style
    // spelled out.
    val decoded = when(text.contains("<") || text.contains("&"),
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
        .foldLeft(
          regexp_replace(
            regexp_replace(text,
              "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->", " "),
            "(?s)<[^>]*>", " ")) {
          case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
        }).otherwise(text)
    val hCollapsed = regexp_replace(decoded, "[^\\S\\n]+", " ")
    // any run CONTAINING a newline collapses to one '\n' — " \n \n " is
    // a single blank-line run, not two (a ' ?\n+ ?' pattern would leave
    // "\n\n" behind and feed phantom empty lines to line censuses)
    trim(regexp_replace(hCollapsed, "[ \\n]*\\n[ \\n]*", "\n"), " \n")
  }

  /** Unigram language-model score (perplexity proxy, the classic web-
    * corpus quality signal): Σ log10 P(token) under the CORPUS unigram
    * distribution, per document. Two passes, both scale-shaped: the token
    * census is one partial-aggregated shuffle of (token, count); scoring
    * joins token rows back to the census (equi-join on the token — at
    * 100 TB, bucket the census by token or broadcast a top-K census with
    * an OOV floor). The per-token log is rounded to MICRO-log10 integers
    * (round(log10·1e6) — integral doubles cast exactly to long), so the
    * per-doc sum is exact integer arithmetic: no float-order dependence,
    * the oracle hash-matches, and avg derives deterministically.
    *
    * Output: (doc_id, n_tokens, logp_sum_micro, avg_logp10); token-less
    * docs carry n_tokens = 0 and null scores.
    */
  def unigramLogProb(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col(textCol))).as("t"))
    val census = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val totals = census.agg(sum(col("c")).as("n")) // one row, broadcast
    val scored = tok.join(census, Seq("t"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log10(col("c").cast("double") / col("n")) * 1e6).cast("long").as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("logp_sum_micro"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logp_sum_micro"),
        round(col("logp_sum_micro").cast("double")
          / col("n_tokens") / 1e6, 6).as("avg_logp10"))
  }

  /** Interpolated bigram language-model score (Jelinek–Mercer smoothing
    * — the KenLM-lite perplexity signal, one order up from
    * [[unigramLogProb]]): the first token of a document scores
    * log10 P(w) under the corpus unigram distribution; every later
    * token scores log10(λ·c(prev,w)/c(prev) + (1−λ)·c(w)/N). Bigram
    * evidence dominates where the corpus has seen the transition;
    * the unigram floor keeps unseen transitions finite — no
    * add-one blowup over the quadratic bigram space.
    *
    * Tokenization is [[kernelTokens]] (full whitespace trim), NOT
    * [[tokens]]: positions matter here (token i+1 pairs with token i,
    * via the n=2 shingle window invariant), and a phantom empty first
    * token would corrupt every first transition. All censuses are
    * derived from the same kernel-token stream so the model is
    * self-consistent.
    *
    * Portability: per-token logs round to MICRO-log10 integers before
    * the per-doc sum (exact integer arithmetic; the interpolation's
    * float ops run in one fixed order mirrored by the oracle).
    *
    * 100 TB shape: two censuses (unigram ≤ vocab rows, bigram ≤ seen-
    * transition rows) partial-aggregate map-side; scoring is equi-joins
    * of the pair stream onto them — the bigram census is the big one
    * (it IS the KenLM model size) and shuffles on the pair key; at
    * scale, prune it with a min-count floor the same way KenLM does
    * (here: `minPairCount`, default 1 = keep all).
    *
    * Output: (doc_id, n_tokens, logp_sum_micro, avg_logp10);
    * token-less docs carry n_tokens = 0 and null scores.
    */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.7,
                    minPairCount: Long = 1,
                    textCol: String = "text"): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val toks = docs.select(col("doc_id"), kernelTokens(col(textCol)).as("_toks"))
    val tok = toks.select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "t")))
    val uni = tok.groupBy("t").agg(count(lit(1)).as("cu"))
    val nTot = uni.agg(sum(col("cu")).as("n")) // one row, broadcast
    // adjacent pairs: shingle window i covers kernel tokens i, i+1 — the
    // SCORED token is the second element
    val pairs = toks.select(col("doc_id"),
        explode(graft.functions.NGramShingles.shingles(
          array_join(col("_toks"), " "), 2, distinct = false)).as("g"))
      .where(size(split(col("g"), " ")) === 2)
    val big = pairs.groupBy("g").agg(count(lit(1)).as("cb"))
      .where(col("cb") >= minPairCount)
    // first-token rows: unigram-only score
    val firstScores = tok.where(col("pos") === 0)
      .join(uni, Seq("t"))
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"),
        round(log10(col("cu").cast("double") / col("n")) * 1e6)
          .cast("long").as("lp"))
    // transition rows: λ·c_ab/c_prev + (1−λ)·c_w/N, one log10 at the end;
    // a pruned (minPairCount) transition falls back to the unigram floor
    val pairScores = pairs
      .select(col("doc_id"),
        split(col("g"), " ").getItem(0).as("_prev"),
        split(col("g"), " ").getItem(1).as("_w"),
        col("g"))
      .join(big, Seq("g"), "left_outer")
      .join(uni.select(col("t").as("_prev"), col("cu").as("_cprev")), Seq("_prev"))
      .join(uni.select(col("t").as("_w"), col("cu").as("_cw")), Seq("_w"))
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"),
        round(log10(
          lit(lambda) * coalesce(col("cb"), lit(0L)).cast("double") / col("_cprev")
            + lit(1.0d - lambda) * col("_cw").cast("double") / col("n")) * 1e6)
          .cast("long").as("lp"))
    val scored = firstScores.unionByName(pairScores)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("logp_sum_micro"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logp_sum_micro"),
        round(col("logp_sum_micro").cast("double")
          / col("n_tokens") / 1e6, 6).as("avg_logp10"))
  }

  /** Kneser–Ney bigram language-model score — the production smoothing
    * (what KenLM actually ships), one notch above the Jelinek–Mercer
    * interpolation of [[bigramLogProb]]: the lower-order distribution is
    * the CONTINUATION probability (in how many distinct contexts does w
    * appear?), not raw frequency, so ubiquitous-but-context-bound tokens
    * ("francisco") stop inflating unseen transitions.
    *
    *   P(w|prev) = (c(prev,w) − D)/c(prev)
    *             + D·N1+(prev,·)/c(prev) · N1+(·,w)/T
    *
    * with T = distinct bigram types; every scored transition is corpus-
    * attested (c ≥ 1 > D), so probabilities stay positive without a
    * max(). First tokens score the type-smoothed continuation
    * probability (N1+(·,w)+1)/(T+V) — the documented fallback for
    * tokens that never occur mid-sentence. All censuses are integer;
    * the per-token float chain runs in one fixed order and rounds to
    * MICRO-log10 before the exact per-doc sum (the house portability
    * contract).
    *
    * Scale shape = [[bigramLogProb]]: the bigram census is the model;
    * the three derived censuses (prefix totals + distinct-successor
    * counts, distinct-predecessor counts, type totals) partial-aggregate
    * from it; scoring is equi-joins of the pair stream onto them.
    */
  def bigramLogProbKN(docs: DataFrame, discount: Double = 0.75,
                      textCol: String = "text"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val toks = docs.select(col("doc_id"), kernelTokens(col(textCol)).as("_toks"))
    val tok = toks.select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "t")))
    val pairs = toks.select(col("doc_id"),
        explode(graft.functions.NGramShingles.shingles(
          array_join(col("_toks"), " "), 2, distinct = false)).as("g"))
      .where(size(split(col("g"), " ")) === 2)
    val big = pairs.groupBy("g").agg(count(lit(1)).as("cab"))
      .select(split(col("g"), " ").getItem(0).as("_prev"),
        split(col("g"), " ").getItem(1).as("_w"), col("g"), col("cab"))
    val prevStats = big.groupBy("_prev")
      .agg(sum(col("cab")).as("cprev"), count(lit(1)).as("n1prev"))
    val contStats = big.groupBy("_w").agg(count(lit(1)).as("n1w"))
    val totals = big.agg(count(lit(1)).as("tt")) // distinct bigram types
      .crossJoin(tok.agg(count_distinct(col("t")).as("vv")))
    val firstScores = tok.where(col("pos") === 0)
      .join(contStats.select(col("_w").as("t"), col("n1w")), Seq("t"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log10((coalesce(col("n1w"), lit(0L)).cast("double") + 1.0d)
          / (col("tt").cast("double") + col("vv"))) * 1e6)
          .cast("long").as("lp"))
    val pairScores = pairs
      .join(big.select(col("g"), col("_prev"), col("_w"), col("cab")), Seq("g"))
      .join(prevStats, Seq("_prev"))
      .join(contStats, Seq("_w"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log10(
          (col("cab").cast("double") - lit(discount)) / col("cprev")
            + lit(discount) * col("n1prev") / col("cprev")
              * (col("n1w").cast("double") / col("tt"))) * 1e6)
          .cast("long").as("lp"))
    val scored = firstScores.unionByName(pairScores)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("logp_sum_micro"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logp_sum_micro"),
        round(col("logp_sum_micro").cast("double")
          / col("n_tokens") / 1e6, 6).as("avg_logp10"))
  }

  /** Kneser–Ney TRIGRAM language-model score — one order above
    * [[bigramLogProbKN]], the order KenLM ships by default for quality
    * filtering. The interpolated-KN recursion with a single discount D:
    *
    *   P(w|u,v) = (c(uvw) − D)/c(uv·) + D·N1+(uv·)/c(uv·) · P₂(w|v)
    *   P₂(w|v)  = (N1+(·vw) − D)/N1+(·v·) + D·N1+(v·)/N1+(·v·) · N1+(·w)/T
    *
    * — the middle order is built from CONTINUATION counts (distinct
    * left-contexts), not raw bigram frequencies: that is the defining
    * KN move, applied at both backoff levels. Every scored trigram is
    * corpus-attested (c ≥ 1 > D) and every attested (v,w) has
    * N1+(·vw) ≥ 1 > D, so all terms stay positive without clamping.
    * Position 1 (the doc's second token) has only one token of context
    * and scores the BIGRAM-KN probability; position 0 scores the
    * type-smoothed continuation unigram (N1+(·w)+1)/(T+V) — same
    * fallbacks as the bigram model, so per-doc token accounting is
    * exact: n₀ + n₁ + (n−2) rows for an n-token doc.
    *
    * Scale shape: the TRIGRAM census is the model (one partial-agg
    * shuffle of the trigram stream); all five derived censuses
    * (context totals/successors, continuation counts, middle totals,
    * bigram prefix/continuation stats) partial-aggregate from the
    * trigram or bigram census — never from the corpus again. Scoring is
    * equi-joins of the doc streams onto them plus one broadcast 1-row
    * totals frame. Per-token float chain in one fixed order, rounded to
    * micro-log10 before the exact integer per-doc sum (the house
    * portability contract).
    */
  def trigramLogProbKN(docs: DataFrame, discount: Double = 0.75,
                       textCol: String = "text"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val toks = docs.select(col("doc_id"), kernelTokens(col(textCol)).as("_toks"))
    val tok = toks.select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "t")))
    val pairs = toks.select(col("doc_id"),
        explode(graft.functions.NGramShingles.shingles(
          array_join(col("_toks"), " "), 2, distinct = false)).as("g"))
      .where(size(split(col("g"), " ")) === 2)
    val tris = toks.select(col("doc_id"),
        explode(graft.functions.NGramShingles.shingles(
          array_join(col("_toks"), " "), 3, distinct = false)).as("g3"))
      .where(size(split(col("g3"), " ")) === 3)
    // trigram census = the model; (u,v,w) split once here, reused below
    val tri = tris.groupBy("g3").agg(count(lit(1)).as("c3"))
      .select(split(col("g3"), " ").getItem(0).as("_u"),
        split(col("g3"), " ").getItem(1).as("_v"),
        split(col("g3"), " ").getItem(2).as("_w"), col("g3"), col("c3"))
    val ctx = tri.groupBy("_u", "_v")
      .agg(sum(col("c3")).as("cuv"), count(lit(1)).as("n1uv"))
    val midCont = tri.groupBy("_v", "_w").agg(count(lit(1)).as("n1vw"))
    val midTot = tri.groupBy("_v").agg(count(lit(1)).as("n1vmid"))
    val big = pairs.groupBy("g").agg(count(lit(1)).as("cab"))
      .select(split(col("g"), " ").getItem(0).as("_prev"),
        split(col("g"), " ").getItem(1).as("_w"), col("g"), col("cab"))
    val prevStats = big.groupBy("_prev")
      .agg(sum(col("cab")).as("cprev"), count(lit(1)).as("n1prev"))
    val contStats = big.groupBy("_w").agg(count(lit(1)).as("n1w"))
    val totals = big.agg(count(lit(1)).as("tt"))
      .crossJoin(tok.agg(count_distinct(col("t")).as("vv")))
    // pos 0: continuation unigram with +1 type smoothing
    val firstScores = tok.where(col("pos") === 0)
      .join(contStats.select(col("_w").as("t"), col("n1w")), Seq("t"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log10((coalesce(col("n1w"), lit(0L)).cast("double") + 1.0d)
          / (col("tt").cast("double") + col("vv"))) * 1e6)
          .cast("long").as("lp"))
    // pos 1: bigram-KN on the doc's FIRST pair only (the other pairs
    // are covered by the trigram stream)
    val firstPair = toks.where(size(col("_toks")) >= 2)
      .select(col("doc_id"),
        array_join(slice(col("_toks"), 1, 2), " ").as("g"))
    val secondScores = firstPair
      .join(big.select(col("g"), col("_prev"), col("_w"), col("cab")), Seq("g"))
      .join(prevStats, Seq("_prev"))
      .join(contStats, Seq("_w"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log10(
          (col("cab").cast("double") - lit(discount)) / col("cprev")
            + lit(discount) * col("n1prev") / col("cprev")
              * (col("n1w").cast("double") / col("tt"))) * 1e6)
          .cast("long").as("lp"))
    // pos ≥ 2: full trigram-KN over the attested trigram stream
    val triScores = tris
      .join(tri.select(col("g3"), col("_u"), col("_v"), col("_w"), col("c3")),
        Seq("g3"))
      .join(ctx, Seq("_u", "_v"))
      .join(midCont, Seq("_v", "_w"))
      .join(midTot, Seq("_v"))
      .join(prevStats.select(col("_prev").as("_v"), col("n1prev")), Seq("_v"))
      .join(contStats, Seq("_w"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log10(
          (col("c3").cast("double") - lit(discount)) / col("cuv")
            + lit(discount) * col("n1uv") / col("cuv")
              * ((col("n1vw").cast("double") - lit(discount)) / col("n1vmid")
                + lit(discount) * col("n1prev") / col("n1vmid")
                  * (col("n1w").cast("double") / col("tt")))) * 1e6)
          .cast("long").as("lp"))
    val scored = firstScores.unionByName(secondScores).unionByName(triScores)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("logp_sum_micro"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logp_sum_micro"),
        round(col("logp_sum_micro").cast("double")
          / col("n_tokens") / 1e6, 6).as("avg_logp10"))
  }

  /** CCNet-style perplexity bucketing: rank documents by the unigram LM
    * score ([[unigramLogProb]]) and split head / middle / tail — the
    * standard quality-banding step before mixing (train mostly on
    * head+middle, sample tail). Higher avg log-probability = more
    * LM-typical text = "head".
    *
    * Only token-bearing docs are bucketed (empty docs have no score —
    * drop or route them upstream). The ordering key is the 6dp-rounded
    * avg (deterministic: derived from exact integer micro-log sums, so
    * both engines compute the identical double) with doc_id tiebreak.
    *
    *  - `exact = true`: percent_rank over a single global window — the
    *    oracle-replayable mode; one global sort, fine into the tens of
    *    millions of docs, NOT the 100 TB path.
    *  - `exact = false`: the scale path — two approx_percentile
    *    thresholds (one partial-agg pass, no global sort) broadcast back
    *    as cut points; band boundaries are then approximate by the
    *    sketch's rank error, which is the standard trade for this step.
    */
  def perplexityBuckets(docs: DataFrame, headFrac: Double = 1.0 / 3,
                        tailFrac: Double = 1.0 / 3,
                        textCol: String = "text",
                        exact: Boolean = true): DataFrame = {
    require(headFrac > 0 && tailFrac > 0 && headFrac + tailFrac < 1,
      s"fractions must be positive and sum below 1, got $headFrac/$tailFrac")
    val scored = unigramLogProb(docs, textCol).where(col("n_tokens") > 0)
    if (exact) {
      val w = Window.orderBy(col("avg_logp10").desc, col("doc_id").asc)
      scored
        .withColumn("_pr", percent_rank().over(w))
        .withColumn("bucket",
          when(col("_pr") < headFrac, "head")
            .when(col("_pr") >= 1.0d - tailFrac, "tail")
            .otherwise("middle"))
        .drop("_pr")
    } else {
      val thresholds = scored.agg(
        expr(s"approx_percentile(avg_logp10, ${1.0 - headFrac})").as("_hcut"),
        expr(s"approx_percentile(avg_logp10, $tailFrac)").as("_tcut"))
      scored.crossJoin(broadcast(thresholds))
        .withColumn("bucket",
          when(col("avg_logp10") >= col("_hcut"), "head")
            .when(col("avg_logp10") <= col("_tcut"), "tail")
            .otherwise("middle"))
        .drop("_hcut", "_tcut")
    }
  }

  /** Normalization for fingerprinting/dedup: lowercase, strip
    * non-alphanumerics, collapse whitespace.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " "))

  /** Content fingerprint of the normalized text (md5 → stable across
    * engines and versions; a rolling/Rabin-style hash would not be
    * reproducible in an external oracle).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 64-bit rolling-hash fingerprint of the normalized text (Karp–Rabin,
    * graft.functions.RollingHash64): cheaper than md5 per byte and O(1)
    * incrementally updatable. Oracle-portable via the recursive-CTE
    * integer replay (see RollingHash64's scaladoc / the t_rolling_fp
    * gate); [[fingerprint]] stays the md5 default for join-key use.
    */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash64.rollingHash(normalized(text))

  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), fingerprint(col(textCol)).as("fp"))

  /** Flesch reading-ease score — the classic readability quality signal
    * next to the Gopher/C4 rules: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Syllables are approximated by vowel-group
    * counts ([aeiouy]+ runs, floor 1 per word) — the standard
    * dictionary-free heuristic, and crucially one an external SQL
    * oracle can replay exactly (a hyphenation library could not).
    * Sentences count [.!?]+ runs on the RAW text (normalization strips
    * punctuation), floor 1. Word-less docs carry a null score
    * (try_divide). Shuffle-free projection; one codegen pass.
    *
    * Output: (doc_id, n_words, n_sentences, n_syllables, flesch) with
    * flesch rounded to 6dp.
    */
  def readability(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    val words = tokens(normalized(raw))
    val nWords = size(words).cast("long")
    val nSent = greatest(regexp_count(raw, lit("[.!?]+")), lit(1)).cast("long")
    val nSyll = aggregate(
      transform(words, w => greatest(regexp_count(w, lit("[aeiouy]+")), lit(1))),
      lit(0L), (acc, s) => acc + s)
    docs.select(col("doc_id"),
        nWords.as("n_words"), nSent.as("n_sentences"), nSyll.as("n_syllables"))
      .withColumn("flesch", round(
        lit(206.835)
          - lit(1.015) * try_divide(col("n_words").cast("double"), col("n_sentences"))
          - lit(84.6) * try_divide(col("n_syllables").cast("double"), col("n_words")),
        6))
  }
}

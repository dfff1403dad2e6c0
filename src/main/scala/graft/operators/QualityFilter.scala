package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style composite quality filtering: the rule set real
  * training-data pipelines run after signal extraction — token-count
  * band, mean-token-length band, stopword floor, duplicate-n-gram
  * ceilings — with per-document reject reasons, not just a boolean,
  * so filter decisions are auditable downstream.
  *
  * All signals are computed in ONE projection over the text column (no
  * self-join of signal frames) and every signal is rounded to 6dp
  * before comparison, so the verdicts are reproducible across engines.
  * Both [[tag]] and [[apply]] are scans: no shuffle, codegen
  * end-to-end.
  */
object QualityFilter {

  /** Thresholds; defaults follow the published Gopher band shapes. */
  case class Rules(
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanTokenLen: Double = 3.0, maxMeanTokenLen: Double = 10.0,
      minStopwordFrac: Double = 0.0,
      maxDup2gramFrac: Double = 1.0, maxDup3gramFrac: Double = 1.0)

  /** The signal expressions, by output name, over `textCol`. */
  private def signalExprs(textCol: String): Seq[(String, Column)] = {
    val toks = TextAnalysis.tokens(col(textCol))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isInCollection(TextAnalysis.EnglishStopwords)))
    def dupFrac(n: Int): Column = {
      val all = graft.functions.NGramShingles.shingles(
        TextAnalysis.normalized(col(textCol)), n, distinct = false)
      round(lit(1.0) - size(array_distinct(all)).cast("double")
        / greatest(size(all), lit(1)), 6)
    }
    Seq(
      "n_tokens" -> nTok,
      "mean_token_len" -> round((length(col(textCol)) - (nTok - lit(1))).cast("double")
        / greatest(nTok, lit(1)), 6),
      "stopword_frac" -> round(nStop.cast("double") / greatest(nTok, lit(1)), 6),
      "dup_2gram_frac" -> dupFrac(2),
      "dup_3gram_frac" -> dupFrac(3))
  }

  /** Failing-rule (name, condition) pairs in fixed report order, as
    * functions of the signal columns produced by `lookup`.
    */
  private def checks(rules: Rules, lookup: String => Column): Seq[(String, Column)] = Seq(
    "too_few_tokens" -> (lookup("n_tokens") < rules.minTokens),
    "too_many_tokens" -> (lookup("n_tokens") > rules.maxTokens),
    "mean_token_len_low" -> (lookup("mean_token_len") < rules.minMeanTokenLen),
    "mean_token_len_high" -> (lookup("mean_token_len") > rules.maxMeanTokenLen),
    "stopword_frac_low" -> (lookup("stopword_frac") < rules.minStopwordFrac),
    "dup_2gram_high" -> (lookup("dup_2gram_frac") > rules.maxDup2gramFrac),
    "dup_3gram_high" -> (lookup("dup_3gram_frac") > rules.maxDup3gramFrac))

  /** One projection computing every signal the rules consult. */
  def signals(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id") +: signalExprs(textCol).map { case (n, c) => c.as(n) }: _*)

  /** Signals + verdict + comma-joined failing-rule names (fixed order,
    * empty string when kept) per document.
    */
  def tag(docs: DataFrame, rules: Rules, textCol: String = "text"): DataFrame = {
    // concat_ws skips NULLs, so un-fired rules vanish from the list
    val reasons = concat_ws(",",
      checks(rules, col).map { case (name, cond) => when(cond, lit(name)) }: _*)
    signals(docs, textCol)
      .withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === "")
  }

  /** The surviving documents, original schema — the predicate is
    * inlined over the signal expressions, so this stays a scan with
    * no join back. Repeated heavyweight subtrees in the pushed-down
    * predicate (the token array, the shingle arrays, and — when
    * `textCol` is itself a projected derivation like stripMarkup'd
    * text — that whole derivation, measured 92 inlined copies on the
    * pipe_full head) are re-deduplicated at optimization time by
    * [[graft.plans.BindFilterCommon]].
    */
  def apply(docs: DataFrame, rules: Rules, textCol: String = "text"): DataFrame = {
    val exprs = signalExprs(textCol).toMap
    val rejected = checks(rules, exprs).map(_._2).reduce(_ || _)
    docs.where(!rejected)
  }
}

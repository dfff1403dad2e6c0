package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.LcsLength

/** ROUGE-L — longest-common-subsequence F-measure (Lin, ACL 2004), the
  * third leg of the generation-eval triad next to [[Bleu]] (precision-
  * oriented n-gram overlap) and [[ChrF]] (char-gram F_2): LCS rewards
  * in-order coverage without requiring contiguity, which is why
  * summarization evals lead with it.
  *
  * Per pair: lcs = |LCS(candidate tokens, reference tokens)| via the
  * native [[LcsLength]] expression (O(m·n) DP inside one codegen'd
  * call), P = lcs/m, R = lcs/n, and the β=1 F-measure collapses to
  * F = 2·lcs/(m+n) — one integer-derived double, rounded once at 6dp,
  * so the whole metric is oracle-exact. The operator is a shuffle-free
  * projection: per-pair cost is quadratic in RESPONSE length (bounded),
  * corpus cost is linear in pairs, and nothing aggregates until the
  * caller asks for [[corpusRougeL]] (one partial-agg of 3 integer
  * sums).
  */
object Rouge {

  private def tokens(text: Column): Column = {
    val norm = TextAnalysis.normalized(text)
    when(norm === "", array().cast("array<string>")).otherwise(split(norm, " "))
  }

  /** Per-pair ROUGE-L. Input: `pair_id`, `candidate`, `reference` (raw
    * text). Output: pair_id, c_len, r_len, lcs, rouge_l (micro-F,
    * 6dp). Either side empty → lcs 0 → rouge_l 0.
    */
  def rougeL(pairs: DataFrame): DataFrame =
    pairs.select(col("pair_id"),
        tokens(col("candidate")).as("c_toks"),
        tokens(col("reference")).as("r_toks"))
      .select(col("pair_id"),
        size(col("c_toks")).cast("long").as("c_len"),
        size(col("r_toks")).cast("long").as("r_len"),
        LcsLength.lcsLength(col("c_toks"), col("r_toks")).cast("long").as("lcs"))
      .withColumn("rouge_l", fScore(col("lcs"), col("c_len"), col("r_len")))

  /** Corpus (micro-averaged) ROUGE-L: integer censuses summed over
    * pairs, then the same F chain — one partial-agg shuffle of 3 longs.
    */
  def corpusRougeL(pairs: DataFrame): DataFrame =
    rougeL(pairs)
      .agg(sum("c_len").as("c_len"), sum("r_len").as("r_len"),
        sum("lcs").as("lcs"))
      .withColumn("rouge_l", fScore(col("lcs"), col("c_len"), col("r_len")))

  /** β=1 LCS F-measure, algebraically 2·lcs/(c+r); 0 when lcs = 0
    * (covers both-empty without a 0/0).
    */
  private def fScore(lcs: Column, cLen: Column, rLen: Column): Column =
    when(lcs === 0, lit(0.0))
      .otherwise(round(lit(2.0) * lcs / (cLen + rLen), 6))
}

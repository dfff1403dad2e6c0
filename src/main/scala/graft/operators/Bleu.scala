package graft.operators

import graft.functions.NGramShingles
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus/sentence BLEU — the n-gram-overlap generation metric an LLM
  * pipeline runs over (candidate, reference) pairs when grading model
  * outputs, distillation data, or translation corpora at scale
  * (Papineni et al., ACL 2002: modified n-gram precision with
  * reference-clipped counts, geometric mean over n = 1..4, brevity
  * penalty).
  *
  * 100 TB shape: everything is n-gram CENSUS algebra — explode each
  * side once into (pair, n, gram, count) partial-agg censuses, inner
  * equi-join cand × ref on (pair, n, gram) for the clipped matches
  * (grams missing from the reference clip to zero and never join), and
  * fold back to pair grain. Candidate totals need no gram pass at all:
  * total_n = len − n + 1 from the token-count column. No driver data
  * path; corpus BLEU is one more partial agg over the pair frame.
  *
  * Exactness: counts and lengths are integers; BLEU itself is ONE
  * double chain — brevity penalty × exp(mean ln precision) — rounded
  * once to 6dp, the engine's portability contract for libm chains. A
  * pair with any zero clipped match (or an empty candidate) scores 0
  * (plain BLEU, no smoothing): deterministic, and the standard corpus
  * behavior where the aggregate matches, not the zeros, carry signal.
  *
  * Token contract: [[TextAnalysis.normalized]] (lower, strip
  * punctuation, collapse whitespace) then whitespace tokens — the same
  * fold the dedup family uses, replayed verbatim by the SQL oracle.
  * Sides shorter than n contribute no n-grams (the shingle kernel's
  * short-input singleton is filtered out by the len ≥ n guard on BOTH
  * census sides, so it can never spuriously match).
  */
object Bleu {

  val MaxN = 4

  private def tokLen(norm: Column): Column =
    when(norm === "", 0).otherwise(size(split(norm, " ")))

  /** Per-pair BLEU. Input needs `pair_id` (unique per pair), `candidate`,
    * `reference` (raw text); output: pair_id, c_len, r_len, m1..m4
    * (clipped matches), t1..t4 (candidate n-gram totals), bleu.
    *
    * Shape (round 8): ONE normalize+gram pass over both sides — sides
    * are exploded into (side, norm) rows before shingling, and clipped
    * matches come from conditional counts in a single (pair, n, gram)
    * census (`least(c_cnt, r_cnt)`; a gram on one side only clips to 0,
    * exactly what the old cand ⨝ ref inner join dropped). The old plan
    * referenced the normalized frame three times (two per-side censuses
    * + the length frame) so the regexp normalization chain ran 3× per
    * row, and paid a string-keyed sort-merge join of the censuses; both
    * are gone. Lengths fall out of the same census (c_len ≡ t₁ token
    * count, and per-side n-gram totals ≡ len − n + 1), so the only other
    * input pass is a cheap pair_id + null-flag projection that anchors
    * gram-free pairs and restores `size(split(null))` null semantics.
    */
  def sentenceBleu(pairs: DataFrame): DataFrame = {
    val skeleton = pairs.select(col("pair_id"),
      col("candidate").isNull.as("_c_null"), col("reference").isNull.as("_r_null"))

    val sided = pairs.select(col("pair_id"),
        explode(array(
          struct(lit(0).as("side"),
            TextAnalysis.normalized(col("candidate")).as("norm")),
          struct(lit(1).as("side"),
            TextAnalysis.normalized(col("reference")).as("norm")))).as("s"))
      .select(col("pair_id"), col("s.side").as("side"), col("s.norm").as("norm"),
        tokLen(col("s.norm")).as("len"))
    val grams = sided.select(col("pair_id"), col("side"),
        explode(array((1 to MaxN).map { n =>
          struct(lit(n).as("n"),
            when(col("len") >= n,
              NGramShingles.shingles(col("norm"), n, distinct = false))
              .otherwise(array().cast("array<string>")).as("grams"))
        }: _*)).as("ng"))
      .select(col("pair_id"), col("side"), col("ng.n").as("n"),
        explode(col("ng.grams")).as("gram"))

    val census = grams.groupBy("pair_id", "n", "gram")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c_cnt"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("r_cnt"))
      .select(col("pair_id"), col("n"), col("c_cnt"), col("r_cnt"),
        least(col("c_cnt"), col("r_cnt")).as("m"))
      .groupBy("pair_id")
      .agg(sum(when(col("n") === 1, col("m")).otherwise(0L)).as("m1"),
        ((2 to MaxN).map(n =>
          sum(when(col("n") === n, col("m")).otherwise(0L)).as(s"m$n")) ++
          // only 1-gram totals aggregate: t₁ IS the token count, higher
          // orders are the projection greatest(0, t₁ − (n−1))
          Seq(sum(when(col("n") === 1, col("c_cnt")).otherwise(0L)).as("t1"),
            sum(when(col("n") === 1, col("r_cnt")).otherwise(0L)).as("_rt1"))): _*)

    val joined = skeleton.join(census, Seq("pair_id"), "left")
      .select(Seq(col("pair_id"),
        when(col("_c_null"), lit(null).cast("int"))
          .otherwise(coalesce(col("t1"), lit(0L)).cast("int")).as("c_len"),
        when(col("_r_null"), lit(null).cast("int"))
          .otherwise(coalesce(col("_rt1"), lit(0L)).cast("int")).as("r_len")) ++
        (1 to MaxN).flatMap(n => Seq(
          coalesce(col(s"m$n"), lit(0L)).as(s"m$n"),
          greatest(lit(0L), coalesce(col("t1"), lit(0L)) - (n - 1)).as(s"t$n"))): _*)

    joined.withColumn("bleu", bleuChain(
      (1 to MaxN).map(n => (col(s"m$n"), col(s"t$n"))),
      col("c_len"), col("r_len")))
  }

  /** Corpus BLEU: matches/totals summed over pairs first (the standard
    * corpus statistic), then the same single chain. One row.
    */
  def corpusBleu(pairs: DataFrame): DataFrame = {
    val per = sentenceBleu(pairs).drop("bleu")
    val agg = per.agg(sum("c_len").as("c_len"),
      (Seq(sum("r_len").as("r_len")) ++
        (1 to MaxN).flatMap(n =>
          Seq(sum(s"m$n").as(s"m$n"), sum(s"t$n").as(s"t$n")))): _*)
    agg.withColumn("bleu", bleuChain(
      (1 to MaxN).map(n => (col(s"m$n"), col(s"t$n"))),
      col("c_len"), col("r_len")))
  }

  /** The one rounded double chain (both engines evaluate it verbatim):
    * bp · exp(Σ ln(mₙ/tₙ) / N), zero when any mₙ = 0 or the candidate
    * is empty.
    */
  private def bleuChain(mt: Seq[(Column, Column)], cLen: Column, rLen: Column): Column = {
    val anyZero = mt.map { case (m, _) => m === 0L }.reduce(_ || _)
    val logSum = mt.map { case (m, t) =>
      log(m.cast("double") / t.cast("double"))
    }.reduce(_ + _)
    val bp = when(cLen >= rLen, lit(1.0))
      .otherwise(exp(lit(1.0) - rLen.cast("double") / cLen.cast("double")))
    when(cLen === 0 || anyZero, lit(0.0))
      .otherwise(round(bp * exp(logSum / mt.size), 6))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency-based token subsampling (Mikolov et al. 2013, word2vec):
  * keep a token occurrence with probability
  * p(w) = min(1, √(t/f(w)) + t/f(w)) — ubiquitous tokens ("the",
  * boilerplate markers) are aggressively thinned while rare tokens
  * survive untouched, which is the cheap high-leverage rebalance
  * before training skip-gram pairs ([[SkipGram]]) or any
  * co-occurrence census. Beyond-reference surface (SURVEY §2.13).
  *
  * Determinism/portability: f(w) comes from the exact corpus census;
  * p(w) is one double chain (√ is IEEE-correctly-rounded — no libm
  * variance); the keep decision compares the 60-bit md5 uniform on
  * (seed, doc, pos) against p — the [[Bootstrap]] uniform, so every
  * occurrence-level decision replays in an external engine.
  *
  * Scale shape: one token-census shuffle (partial-aggregated), a
  * vocabulary-grain join back onto the token stream (equi-join on
  * term — Spark broadcasts it while the vocabulary fits and shuffles
  * beyond, no hint pinned), and one doc-grain reassembly agg. Docs
  * whose text is null never produce token rows and drop out, matching
  * the token-stream contract of the downstream consumers.
  *
  * Output: (doc_id, n_tokens, n_kept, text_sub) with text_sub the
  * kept tokens rejoined in position order ('' when nothing survives).
  */
object Subsample {

  def frequencySubsample(docs: DataFrame, t: Double = 1e-3,
                         seed: Long = 42L,
                         textCol: String = "text"): DataFrame = {
    require(t > 0, s"subsample threshold must be positive, got $t")
    val toks = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(
          TextAnalysis.normalized(col(textCol)))).as(Seq("pos", "term")))
      .where(col("term") =!= "")
    val census = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val tot = census.agg(sum(col("cnt")).as("ntot"))
    val f: Column = col("cnt").cast("double") / col("ntot")
    val u: Column = (conv(substring(md5(concat(lit(s"subs:$seed:"),
        col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"))), 1, 15), 16, 10).cast("double")
      + lit(0.5d)) / lit(1.152921504606846976e18d)
    toks.join(census, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("p", least(lit(1.0d), sqrt(lit(t) / f) + lit(t) / f))
      .withColumn("keep", u < col("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("term"))))),
          x => x.getField("term")), " ").as("text_sub"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004) at corpus grain —
  * graph-based salience as a third signal next to frequency ([[Salience]]
  * vocabulary/heavy-hitters) and tf-idf: a term matters if it co-occurs
  * with terms that matter. Runs [[PageRank]] over the token
  * co-occurrence graph, so all of that operator's scale/replayability
  * properties carry over unchanged (micro-quantized integer rounds, one
  * partial-agg shuffle per round, zero driver data path). Beyond-
  * reference surface (SURVEY §2.13).
  *
  * Graph construction: tokens are normalized, filtered to length ≥
  * `minLen` (the content-word stand-in for the original's POS filter —
  * an external oracle can replay a length test, not a POS tagger), and
  * ADJACENT surviving tokens pair up (window 2 over the filtered
  * sequence, the classic default). Pairs are deduplicated and
  * symmetrized — TextRank's graph is undirected and unweighted. The
  * zip-adjacent construction is join-free and window-free: one
  * array-slice zip per document, explode, distinct.
  */
object TextRank {

  /** Distinct directed co-occurrence edges (src, dst), both directions,
    * self-pairs dropped (repeated tokens adjacent to themselves).
    */
  def cooccurrenceEdges(docs: DataFrame, textCol: String = "text",
                        minLen: Int = 4): DataFrame = {
    val toks: Column = filter(
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))),
      t => length(t) >= minLen)
    val pairs = docs
      .select(explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col("p.0").as("src"), col("p.1").as("dst"))
      .where(col("src") =!= col("dst"))
    pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** Top-k corpus keywords: (term, pr_micro, rank) by PageRank over the
    * co-occurrence graph, ties broken by term. TakeOrdered top-k (no
    * global window over the vocabulary); the rank window runs on the
    * k-row result only.
    */
  def keywords(docs: DataFrame, textCol: String = "text", k: Int = 20,
               minLen: Int = 4, iterations: Int = 10): DataFrame = {
    val ranks = PageRank.pageRank(
      cooccurrenceEdges(docs, textCol, minLen), iterations)
    val top = ranks
      .orderBy(col("pr_micro").desc, col("node").asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pr_micro").desc, col("node").asc)))
      .select(col("node").as("term"), col("pr_micro"), col("rank"))
  }
}

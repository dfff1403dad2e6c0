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

  /** Per-document co-occurrence edges (doc_id, src, dst) — the grouped
    * twin of [[cooccurrenceEdges]]: adjacency within each doc only.
    */
  def cooccurrenceEdgesPerDoc(docs: DataFrame, textCol: String = "text",
                              minLen: Int = 4): DataFrame = {
    val toks: Column = filter(
      TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))),
      t => length(t) >= minLen)
    val pairs = docs
      .select(col("doc_id"), explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
      .select(col("doc_id"), col("p.0").as("src"), col("p.1").as("dst"))
      .where(col("src") =!= col("dst"))
    pairs
      .unionByName(pairs.select(col("doc_id"), col("dst").as("src"),
        col("src").as("dst")))
      .distinct()
  }

  /** Per-document top-k keywords — TextRank proper (Mihalcea & Tarau
    * rank per document, not per corpus): GROUPED PageRank where every
    * join/aggregate key carries doc_id, so one Spark job ranks ALL
    * documents' graphs simultaneously — the per-group iteration is free
    * parallelism, not a loop over documents. Per-doc teleport mass uses
    * the doc's own node count (a doc-grain join, where the global
    * operator broadcasts one scalar). Same micro-quantized integer
    * rounds as [[PageRank]] — the whole loop replays per (doc, term).
    *
    * Output: (doc_id, term, pr_micro, rank) with rank ≤ k per doc by
    * (pr desc, term asc) — a doc-partitioned window.
    */
  def keywordsPerDoc(docs: DataFrame, textCol: String = "text", k: Int = 5,
                     minLen: Int = 4, iterations: Int = 5,
                     damping: Double = 0.85,
                     checkpointEvery: Int = 3): DataFrame = {
    val e = cooccurrenceEdgesPerDoc(docs, textCol, minLen).localCheckpoint()
    val nodes = e.select(col("doc_id"), col("src").as("node")).distinct()
      .localCheckpoint()
    val nn = nodes.groupBy("doc_id").agg(count(lit(1)).as("nn"))
    val od = e.groupBy("doc_id", "src").agg(count(lit(1)).as("out"))
    var pr = nodes.join(nn, Seq("doc_id"))
      .select(col("doc_id"), col("node"),
        round(lit(1e6) / col("nn")).cast("long").as("pr"))
      .localCheckpoint()
    var i = 1
    while (i <= iterations) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), Seq("doc_id", "src"))
        .join(od, Seq("doc_id", "src"))
        .select(col("doc_id"), col("dst").as("node"),
          round(lit(damping) * col("pr") / col("out")).cast("long").as("c"))
        .groupBy("doc_id", "node").agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("doc_id", "node"), "left_outer")
        .join(nn, Seq("doc_id"))
        .select(col("doc_id"), col("node"),
          (round(lit(1.0 - damping) * lit(1e6) / col("nn")).cast("long")
            + coalesce(col("s"), lit(0L))).as("pr"))
      if (i % checkpointEvery == 0) pr = pr.localCheckpoint()
      i += 1
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pr").desc, col("node").asc)
    pr.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("node").as("term"),
        col("pr").as("pr_micro"), col("rank"))
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

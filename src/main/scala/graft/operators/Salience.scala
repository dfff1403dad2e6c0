package graft.operators

import org.apache.spark.sql.DataFrame
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
}

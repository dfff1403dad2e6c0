package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-level corpus statistics beyond frequency: burstiness and
  * Good–Turing smoothing — the corpus-linguistics layer under the LM
  * family ([[TextAnalysis]] unigram/KN models consume counts; these
  * characterize and correct them).
  */
object TermStats {

  /** Burstiness (index of dispersion): variance-to-mean ratio of a
    * term's PER-DOCUMENT counts across the corpus — function words
    * spread evenly (D ≈ sub-Poisson), content words clump (D ≫ 1), and
    * a template artifact repeats in lockstep — so D separates topical
    * vocabulary from glue both for stop-listing and for boilerplate
    * forensics where raw frequency cannot.
    *
    * Per term over ALL n docs (zero-count docs included via the
    * complement: Σx over docs the term misses is 0 but they still
    * count in n): mean = tf/n, var = (Σx² − tf²/n)/n (population),
    * D = var/mean = (n·Σx² − tf²)/(n·tf) — ONE exact integer
    * numerator/denominator pair (DECIMAL through the squares), a
    * single rounded division. Terms below `minTf` are noise and are
    * dropped.
    *
    * Scale: one (term × doc) census from the token explode, one
    * term-grain partial agg; n rides a broadcast 1-row frame.
    */
  def burstiness(docs: DataFrame, minTf: Long = 10L,
                 textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("t"))
      .where(col("t") =!= "")
    val perDoc = toks.groupBy("t", "doc_id").agg(count(lit(1)).as("x"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    perDoc.groupBy("t")
      .agg(count(lit(1)).as("n_docs_with"),
        sum(col("x")).as("tf"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("_sx2"))
      .where(col("tf") >= minTf)
      .crossJoin(n)
      .select(col("t"), col("n_docs_with"), col("tf"),
        round((col("n_docs").cast("decimal(38,0)") * col("_sx2")
          - col("tf").cast("decimal(38,0)") * col("tf"))
          .cast("double")
          / (col("n_docs").cast("double") * col("tf")), 6)
          .as("dispersion"))
  }

  /** Good–Turing adjusted counts from the frequency-of-frequencies
    * census (Good 1953): r* = (r+1)·N_{r+1}/N_r redistributes mass
    * toward unseen events — the principled fix for the maximum-
    * likelihood estimate's zero-probability holes, and the classic
    * sanity layer under Kneser–Ney's fixed discounts. One row per
    * observed count r: (r, n_r, r_star, p_micro) where p_micro is the
    * per-ITEM smoothed probability r*·1e6/total, plus the r = 0 row
    * carrying the unseen mass N₁/total. r* is null at census holes
    * (N_{r+1} = 0 — where real implementations switch to a fitted
    * curve; reported honestly instead of fabricated).
    *
    * Scale: token explode → term census → the freq-of-freq census is
    * ≤ distinct-count-values rows (tiny) — census-of-a-census grain;
    * the lead() window runs there.
    */
  def goodTuring(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("t"))
      .where(col("t") =!= "")
    val terms = toks.groupBy("t").agg(count(lit(1)).as("r"))
    val fof = terms.groupBy("r").agg(count(lit(1)).as("n_r"))
    val tot = broadcast(terms.agg(sum(col("r")).as("total")))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("r").asc)
    val unseen = fof.crossJoin(tot)
      .where(col("r") === 1L)
      .select(lit(0L).as("r"), lit(0L).as("n_r"),
        round(col("n_r").cast("double") / col("total"), 6).as("r_star"),
        round(col("n_r").cast("double") * lit(1e6) / col("total"))
          .cast("long").as("p_micro"))
    fof
      .withColumn("_next_r", lead(col("r"), 1).over(w))
      .withColumn("_next_n", lead(col("n_r"), 1).over(w))
      .crossJoin(tot)
      .select(col("r"), col("n_r"),
        when(col("_next_r") === col("r") + 1,
          round((col("r") + 1).cast("double") * col("_next_n")
            / col("n_r"), 6)).as("r_star"),
        when(col("_next_r") === col("r") + 1,
          round((col("r") + 1).cast("double") * col("_next_n")
            / col("n_r") * lit(1e6) / col("total")).cast("long"))
          .as("p_micro"))
      .unionByName(unseen)
  }
}

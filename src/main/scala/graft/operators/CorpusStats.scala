package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-card statistics: the per-(lang, source) summary a data
  * release ships — document counts, token totals, duplicate-content
  * rate via exact distinct fingerprints.
  *
  * One partial-aggregated shuffle on the (lang, source) grain. At
  * 100 TB the only term that grows is `count_distinct(fp)`; swap in
  * `approx_count_distinct` (HLL) via `exact = false` when a ±2%
  * estimate is acceptable — the group-by shape is unchanged.
  */
object CorpusStats {

  def datasetCard(docs: DataFrame, textCol: String = "text",
                  exact: Boolean = true): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val fp = TextAnalysis.fingerprint(col(textCol))
    val distinctFp =
      if (exact) count_distinct(col("fp")) else approx_count_distinct(col("fp"))
    docs.select(col("lang"), col("source"),
        size(toks).as("n_toks"), length(col(textCol)).as("n_chars"), fp.as("fp"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_toks")), 6).as("avg_tokens"),
        distinctFp.as("distinct_fp"))
      .withColumn("dup_doc_frac",
        round(lit(1.0) - col("distinct_fp").cast("double") / col("n_docs"), 6))
  }
}

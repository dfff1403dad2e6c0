package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from SURVEY §2;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the driver's
  * hash-match compare (column names aligned on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full FAERS-analog significance pipeline over the synthetic
    * star schema: contingency counts + LLR + seeded Monte-Carlo critical
    * values, keeping significant (drug-analog, event-analog) pairs.
    */
  def entry(spark: SparkSession): DataFrame =
    queries.getOrElse("significant_pairs", queries("q1_agg"))(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ PipelineQueries.queries ++ DataOpsQueries.queries ++
      StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ PipelineQueries.oracles ++ DataOpsQueries.oracles ++
      StreamingQueries.oracles
}

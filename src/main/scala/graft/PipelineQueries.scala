package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FAERS-pipeline-analog queries over the synthetic star schema
  * (contingency + LLR + Monte-Carlo). Filled in as the operator library
  * lands — see graft.operators.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}

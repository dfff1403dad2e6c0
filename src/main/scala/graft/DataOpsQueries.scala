package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) over the documents + embeddings tables. Filled in as the
  * operator library lands — see graft.operators.
  */
object DataOpsQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}

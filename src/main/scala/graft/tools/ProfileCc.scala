package graft.tools

import graft.Tables
import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round wall-clock of ConnectedComponents on the g_connected_components
  * chain graph — isolates fixed per-round scheduling cost from data volume.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = Tables.documents(spark, dir)
      .where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") - 1).as("doc_b"))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = ConnectedComponents.assign(edges).count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    spark.stop()
  }
}

package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

object DebugMain {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
        .toString.take(3500))
    }
    spark.stop()
  }
}

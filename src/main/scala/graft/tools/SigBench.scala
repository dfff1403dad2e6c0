package graft.tools
import graft._
import org.apache.spark.sql.SparkSession
object SigBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val fn = SparkEntry.queries("significant_pairs")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, "/root/testdata/sf0.1").count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    spark.stop()
  }
}

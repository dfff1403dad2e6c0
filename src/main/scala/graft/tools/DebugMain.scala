package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugMain {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = Tables.documents(spark, dir)
    time("simhash run1")(println(Dedup.simhash(d).count()))
    time("simhash run2")(println(Dedup.simhash(d).count()))
    time("j3 run")(println(SparkEntry.queries("j3_left_coalesce")(spark, dir).count()))
    time("cosine run")(println(SparkEntry.queries("e_cosine_topk")(spark, dir).count()))
    time("stratified run")(println(SparkEntry.queries("stratified_sample")(spark, dir).count()))
    spark.stop()
  }
}

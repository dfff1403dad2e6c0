package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugMain {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = Tables.documents(spark, dir)
    val docs = d.unionByName(d.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    time("nearDuplicates run1")(println(Dedup.nearDuplicates(docs).count()))
    time("nearDuplicates run2")(println(Dedup.nearDuplicates(docs).count()))
    time("simhash")(println(Dedup.simhash(d).count()))
    time("minhash signatures")(println(Dedup.minhashSignatures(docs).count()))
    spark.stop()
  }
}

package graft.tools

import graft._
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the near-duplicate pipeline (scratch tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val both = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sh = Dedup.shingleRows(both).cache()
      time("shingleRows")(println(sh.count()))
      val sigs = Dedup.minhashSignaturesFromRows(sh, 32)
      time("signatures")(println(sigs.count()))
      val banded = Dedup.lshBands(sigs, 8)
      time("bands")(println(banded.count()))
      val a = banded.select(col("band").as("b"), col("band_hash").as("h"), col("doc_id").as("doc_a"))
      val bdf = banded.select(col("band").as("b"), col("band_hash").as("h"), col("doc_id").as("doc_b"))
      val cand = a.join(bdf, Seq("b", "h")).where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      time("candidates")(println(cand.count()))
      val verified = Dedup.ngramJaccardFromRows(cand, sh).where(col("jaccard") >= 0.8)
      time("verify")(println(verified.count()))
      sh.unpersist()
      time("full nearDuplicates")(println(Dedup.nearDuplicates(both).count()))
    }
    spark.stop()
  }
}

package graft.tools

import graft._
import graft.config._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugMain {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val res = "src/test/resources"
    val fda = FdaConfig(
      montecarlo = MonteCarloConfig(permutations = 25, percentile = 0.95),
      fdaInputs = FdaInputs(s"$res/blacklist.txt", s"$res/drug_dict.jsonl",
        s"$res/faers_sample.jsonl"),
      outputs = Seq(), sampling = Sampling("/tmp/unused"))
    val clean = Pipeline.cleanEvents(fda)
    println("clean rows=" + clean.count())
    clean.groupBy("chembl_id").agg(countDistinct("safetyreportid")).show()
    val pairs = Pipeline.pairGrain(fda, clean, exactCounts = true)
    println("pairs:")
    pairs.select("chembl_id", "reaction_reactionmeddrapt", "A", "B", "C", "D", "llr")
      .orderBy(desc("llr")).show(40, truncate = false)
    val crit = graft.operators.MonteCarlo.criticalValues(
      graft.operators.Meddra.withEmptyCode(pairs), 0.95, 25, Some(42L))
    crit.show(20, truncate = false)
    spark.stop()
  }
}

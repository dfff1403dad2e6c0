package graft.tools

import graft.Pipeline
import graft.config._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerates the committed golden output for the full FAERS pipeline
  * (clean → blacklist → dictionary join → contingency/LLR → seeded
  * Monte-Carlo → MedDRA annotation) over the test fixtures.
  *
  * Usage: GoldenGen <fixtureDir> <goldenOutFile>
  * where fixtureDir is src/test/resources and goldenOutFile is the TSV
  * PipelineSpec compares against. Run it ONLY when the pipeline's
  * semantics intentionally change; commit the diff with the change.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val Array(fixtures, outFile) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      rows(spark, fixtures).mkString("", "\n", "\n"))
    spark.stop()
  }

  /** The canonical, sorted, 6dp-rounded TSV lines — shared with the spec
    * so generator and comparator can never drift.
    */
  def rows(spark: SparkSession, fixtures: String): Seq[String] = {
    implicit val s: SparkSession = spark
    val out = java.nio.file.Files.createTempDirectory("graft-golden-run").toString
    val cfg = PipelineConfig(
      sparkUri = None,
      outputPath = s"$out/g",
      fda = FdaConfig(
        montecarlo = MonteCarloConfig(permutations = 25, percentile = 0.95,
          seed = Some(42L)),
        fdaInputs = FdaInputs(
          blacklist = s"$fixtures/blacklist.txt",
          chemblData = s"$fixtures/drug_dict.jsonl",
          fdaData = s"$fixtures/faers_sample.jsonl",
          meddraRelease = Some(s"$fixtures/meddra/")),
        outputs = Seq.empty,
        sampling = Sampling(output = s"$out/sample", enabled = false),
        compat = false))
    // section SIG: what run() returns (significant pairs after seeded MC)
    val sig = Pipeline.run(cfg)
      .select(col("chembl_id"), col("event"), col("count"),
        round(col("llr"), 6).as("llr"),
        round(col("critval"), 6).as("critval"), col("meddraCode"))
      .orderBy("chembl_id", "event")
      .collect().toSeq
      .map(r => ("SIG" +: (0 until 6).map(i => String.valueOf(r.get(i)))).mkString("\t"))
    // section PAIR: the full annotated pair grain BEFORE the significance
    // filter — pins clean→blacklist→join→contingency→LLR→MedDRA for every
    // pair the fixtures produce, not just the one engineered signal
    val clean = Pipeline.cleanEvents(cfg.fda)
    val annotated = graft.operators.Meddra.annotate(
      Pipeline.pairGrain(cfg.fda, clean),
      graft.sources.Sources.meddraPreferredTerms(s"$fixtures/meddra/"),
      graft.sources.Sources.meddraLowLevelTerms(s"$fixtures/meddra/"),
      deterministic = true)
    val pairs = annotated
      .select(col("chembl_id"), col("reaction_reactionmeddrapt"),
        col("A"), col("B"), col("C"), col("D"),
        round(col("llr"), 6).as("llr"), col("meddraCode"))
      .orderBy("chembl_id", "reaction_reactionmeddrapt")
      .collect().toSeq
      .map(r => ("PAIR" +: (0 until 8).map(i => String.valueOf(r.get(i)))).mkString("\t"))
    sig ++ pairs
  }
}

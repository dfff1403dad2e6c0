package graft.config

/** Pipeline configuration.
  *
  * Mirrors the reference's config tree and `require` invariants
  * (/root/reference .. config/Configuration.scala:8-40) but hand-rolled:
  * pureconfig/typesafe-config are not on the offline classpath (SURVEY
  * §7.0). Fail-fast on construction, like the reference's load-or-throw.
  */
final case class FdaInputs(
    blacklist: String,
    chemblData: String,
    fdaData: String,
    meddraRelease: Option[String] = None
) {
  require(blacklist.endsWith("txt"), "Blacklist is required in txt extension")
  require(chemblData.endsWith("json") || chemblData.endsWith("jsonl"),
    "ChEMBL data is required in json format")
  require(fdaData.endsWith("json") || fdaData.endsWith("jsonl"),
    "FDA data is required in jsonl format")
}

final case class Sampling(output: String, size: Double = 0.1, enabled: Boolean = false) {
  require(size > 0 && size <= 1, "sampling size must be > 0")
}

final case class MonteCarloConfig(permutations: Int = 100, percentile: Double = 0.95,
                                  seed: Option[Long] = Some(42L)) {
  require(permutations > 0, "permutations must be > 0")
  require(percentile > 0 && percentile < 1, "percentile must be in (0,1)")
}

final case class FdaConfig(
    montecarlo: MonteCarloConfig,
    fdaInputs: FdaInputs,
    outputs: Seq[String],
    sampling: Sampling,
    /** true → reproduce the reference plan shape exactly (windowed
      * approx_count_distinct, nondeterministic dropDuplicates); false →
      * the grouped/deterministic scale path (same results where exact).
      */
    compat: Boolean = false
) {
  private def validOutput(s: String): Boolean =
    List("csv", "json", "jsonl", "parquet").contains(s)
  require(outputs.forall(validOutput), s"outputs must be csv/json/jsonl/parquet: $outputs")
}

final case class PipelineConfig(sparkUri: Option[String], outputPath: String, fda: FdaConfig)

package graft

import graft.config.{FdaConfig, PipelineConfig}
import graft.operators._
import graft.sinks.Sinks
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import org.slf4j.LoggerFactory

/** End-to-end FAERS significance pipeline — the reference's "fda" step
  * (/root/reference .. ETL.scala:12-48 + stage/OpenFdaEtl.scala:16-55),
  * rebuilt Spark-first.
  *
  * Plan shape: sources with explicit schemas → report-level filters →
  * explodes → broadcast anti-join (blacklist) → dictionary inner join →
  * contingency counts + LLR → per-drug Monte-Carlo critical values →
  * significance filter → optional MedDRA annotation → writers.
  *
  * `cfg.compat = true` reproduces the reference's physical strategy
  * (windowed HLL marginals, nondeterministic dedup/RNG); the default is
  * the grouped/deterministic scale path with identical query semantics.
  */
object Pipeline {
  private val log = LoggerFactory.getLogger(getClass)

  /** Stage 1: clean rows joined with the drug dictionary (report grain). */
  def cleanEvents(cfg: FdaConfig)(implicit spark: SparkSession): DataFrame = {
    val drugList = DrugDictionary.fromChembl(Sources.chembl(cfg.fdaInputs.chemblData))
    val fdaData = AdverseEvents.clean(Sources.faers(cfg.fdaInputs.fdaData))
    Blacklist.filter(fdaData, Sources.blacklist(cfg.fdaInputs.blacklist))
      .join(drugList, Seq("drug_name"), "inner")
  }

  /** Stage 2: pair-grain contingency + LLR.
    * @param exactCounts exact distinct counts (oracle-matchable) instead of
    *                    HLL++; only meaningful when compat = false.
    */
  def pairGrain(cfg: FdaConfig, clean: DataFrame, exactCounts: Boolean = false): DataFrame =
    if (cfg.compat)
      Contingency.prepareForMonteCarloFromWindowed(
        Contingency.summaryStatisticsWindowed(clean))
    else
      Contingency.pairStatistics(clean, exact = exactCounts)

  /** Full pipeline, returning the significant (drug, event) pairs and
    * performing configured side-effect writes.
    */
  def run(cfg: PipelineConfig)(implicit spark: SparkSession): DataFrame = {
    val fda = cfg.fda
    val clean = cleanEvents(fda)
    val pairs = pairGrain(fda, clean)

    val annotated = (fda.fdaInputs.meddraRelease match {
      case Some(release) =>
        Meddra.annotate(pairs,
          Sources.meddraPreferredTerms(release),
          Sources.meddraLowLevelTerms(release),
          deterministic = !fda.compat)
      case None => Meddra.withEmptyCode(pairs)
    }).persist(StorageLevel.MEMORY_AND_DISK_SER)

    val mcSeed = if (fda.compat) None else fda.montecarlo.seed
    val significant = MonteCarlo(annotated,
      fda.montecarlo.percentile, fda.montecarlo.permutations, mcSeed)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)

    if (fda.sampling.enabled) {
      log.info("Generating stratified sample")
      val raw = Sources.faers(fda.fdaInputs.fdaData)
      Stratified.sample(clean, significant, raw, fda.sampling.size,
        if (fda.compat) None else Some(42L))
        .write.json(fda.sampling.output)
    }

    fda.outputs.foreach(Sinks.writeUnfiltered(annotated, cfg.outputPath, _))
    fda.outputs.foreach(Sinks.writeResults(significant, cfg.outputPath, _))
    significant
  }
}

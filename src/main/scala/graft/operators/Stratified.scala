package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stratified sample of the raw FAERS input for test corpora — the
  * reference's StratifiedSampling stage (/root/reference ..
  * stage/StratifiedSampling.scala:14-43).
  *
  * Idiomatic deltas (same semantics, SURVEY §7.5): the full-outer-join-as-
  * set-union of the two sampled key frames is union().distinct(), and the
  * raw-report lookup is an explicit left_semi (the reference's inner join
  * against a pre-distinct'd key frame is a semi-join by intent). The
  * seeded draw is reproducible for test corpora (the reference is
  * intentionally non-reproducible — README.md:280-282) and, since round
  * 9, LAYOUT-INDEPENDENT: df.sample(fraction, seed) draws per partition,
  * so any upstream repartition (e.g. the scan fan-out policy) changed
  * which rows survive (round-8 verdict #4). The seeded path now keys a
  * Bernoulli draw on row CONTENT via the engine's md5-hash uniform
  * ([[HashSplit.sampleByHash]] — the same portable idiom DSIR/bootstrap/
  * shuffle use), making the sample a pure function of (seed, chembl_id).
  */
object Stratified {

  /** @param cleanFda       clean event rows (post blacklist/qualification)
    * @param significantFda significant pairs (post Monte-Carlo)
    * @param rawFda         the raw FAERS frame to sample rows from
    * @return sampled raw reports, tagged seriousnessdeath=1 so a pipeline
    *         run over the sample drops them unless re-cleaned (P10 —
    *         StratifiedSampling.scala:38, intentional marker)
    */
  def sample(cleanFda: DataFrame, significantFda: DataFrame, rawFda: DataFrame,
             sampleSize: Double = 0.1, seed: Option[Long] = Some(42L))
            (implicit spark: SparkSession): DataFrame = {
    val idCol = "chembl_id"
    def sampled(df: DataFrame): DataFrame = seed match {
      case Some(s) => HashSplit.sampleByHash(df,
        concat_ws(":", lit("strat"), lit(s.toString), col(idCol)), sampleSize)
      case None => df.sample(sampleSize)
    }
    val significantChembls = sampled(significantFda.select(idCol).distinct())
    val allChembls = sampled(cleanFda.select(idCol).distinct())
    // J6: full_outer + distinct on a single key ≡ union().distinct()
    val sampleOfChemblIds = significantChembls.union(allChembls).distinct()

    val reportIds = cleanFda
      .select(idCol, "safetyreportid")
      .join(sampleOfChemblIds, Seq(idCol))
      .drop(idCol)
      .distinct()

    // J8 as an explicit semi-join: keep raw reports whose id is sampled
    rawFda
      .withColumn("seriousnessdeath", lit(1))
      .join(reportIds, Seq("safetyreportid"), "left_semi")
  }
}

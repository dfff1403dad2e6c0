package graft.operators

import graft.functions.Multinomial
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-drug Monte-Carlo critical values + significance filter — the
  * reference's MonteCarloSampling stage (/root/reference ..
  * stage/MonteCarloSampling.scala:11-57).
  *
  * Grain: after the groupBy there is exactly one row per drug, so a plain
  * scalar UDF is the right tool (a UDAF buys nothing — SURVEY §2.10). The
  * CPU-heavy simulation runs executor-side, embarrassingly parallel over
  * drugs.
  *
  * Determinism (SURVEY §7.6.3): with `seed = Some(s)` the RNG seed is
  * derived per drug from the chembl_id (partition-assignment independent)
  * and the collected per-reaction counts are sorted by reaction term so the
  * multinomial category order is stable. With `seed = None` the reference's
  * intentional nondeterminism is reproduced (unseeded RNG, unsorted
  * collect_list) and the UDF is marked nondeterministic so Catalyst won't
  * collapse re-evaluations.
  */
object MonteCarlo {

  def apply(pairGrain: DataFrame, percentile: Double = 0.99,
            permutations: Int = 100, seed: Option[Long] = Some(42L)): DataFrame = {
    val critValDrug = criticalValues(pairGrain, percentile, permutations, seed)
    val exprs = List(
      "chembl_id",
      "reaction_reactionmeddrapt as event",
      "A as count",
      "llr",
      "critVal_drug as critval",
      "meddraCode"
    )
    pairGrain
      .join(critValDrug, Seq("chembl_id"), "inner")
      .where(col("llr") > col("critVal_drug") && col("critVal_drug") > 0)
      .selectExpr(exprs: _*)
  }

  /** (chembl_id, critVal_drug): one simulation per drug.
    * n_i is the list of per-reaction marginals over the drug's reactions;
    * n_j the drug marginal; total = A+B+C+D (constant per drug).
    */
  def criticalValues(pairGrain: DataFrame, percentile: Double,
                     permutations: Int, seed: Option[Long]): DataFrame = {
    val fn = (chemblId: String, nJ: Long, nI: Seq[Long], total: Long) => {
      // loud failure beats silent Int wrap: a multinomial of >2^31 trials
      // is also computationally out of scope for this simulation
      require(nJ <= Int.MaxValue && total <= Int.MaxValue,
        s"report counts exceed Int range (nJ=$nJ, total=$total); " +
          "the Monte-Carlo simulation is not defined at that grain")
      val s = seed match {
        case Some(g) => Multinomial.seedFor(chemblId, g)
        case None => java.util.concurrent.ThreadLocalRandom.current().nextLong()
      }
      Multinomial.criticalValue(permutations, nJ.toInt, nI.toArray, total.toInt,
        percentile, s)
    }
    val critUdf0 = udf(fn)
    val critUdf = if (seed.isDefined) critUdf0 else critUdf0.asNondeterministic()

    val nIAgg = seed match {
      // stable category order: sort the (reaction, count) pairs by term
      case Some(_) =>
        transform(
          array_sort(collect_list(struct(
            col("reaction_reactionmeddrapt").as("r"),
            col("uniq_report_ids_by_reaction").as("n")))),
          x => x.getField("n")).as("n_i")
      // reference parity: order = arrival order, nondeterministic
      case None => collect_list(col("uniq_report_ids_by_reaction")).as("n_i")
    }

    pairGrain
      .withColumn("uniq_reports_total",
        col("A") + col("B") + col("C") + col("D"))
      .groupBy(col("chembl_id"))
      .agg(
        first(col("uniq_reports_total")).as("uniq_reports_total"),
        nIAgg,
        first(col("uniq_report_ids_by_drug")).as("uniq_report_ids_by_drug"))
      .withColumn("critVal_drug",
        critUdf(col("chembl_id"), col("uniq_report_ids_by_drug"), col("n_i"),
          col("uniq_reports_total")))
      .select("chembl_id", "critVal_drug")
  }
}

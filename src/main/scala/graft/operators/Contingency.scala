package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2×2 contingency counts (A/B/C/D) and log-likelihood ratio per
  * (drug, adverse-event) pair — the reference's `prepareSummaryStatistics`
  * + `prepareForMonteCarlo` (/root/reference .. stage/OpenFdaEtl.scala:
  * 110-160).
  *
  * Two physical strategies, same semantics:
  *
  *  - [[summaryStatisticsWindowed]] + [[prepareForMonteCarloFromWindowed]]:
  *    reference parity, OPT-IN ONLY (`FdaConfig.compat = true`) — three
  *    whole-partition windows attach approx_count_distinct marginals to
  *    every report-grain row, then a full-row distinct collapses to pair
  *    grain. Three full-table shuffles of the exploded table (SURVEY
  *    §4.2) — correct but the dominant cost: measured ~3.3× the scale
  *    path at sf0.1, and the gap widens with data (whole-partition
  *    windows don't partial-aggregate). Exists to reproduce the
  *    reference's physical strategy bit-for-bit; never reach for it on a
  *    real corpus.
  *
  *  - [[pairStatistics]]: THE DEFAULT and the 100 TB plan
  *    (`FdaConfig.compat = false`, which `Pipeline.pairGrain` selects
  *    unless compat is explicitly requested) — aggregate once to pair
  *    grain (map-side partial aggregation shrinks the shuffle to one
  *    compact (drug, reaction) table), compute drug/reaction marginals as
  *    two small groupBys, and broadcast-join them back. The marginal
  *    frames are bounded by the drug/reaction vocabularies (≈10⁴–10⁵
  *    rows) regardless of corpus size, so the joins never shuffle the
  *    big side.
  */
object Contingency {

  /** Exact or HLL++ distinct-count, selectable per caller: exact for
    * oracle-checked paths, approx (reference parity, rsd 0.05) at scale.
    */
  def distinctCount(c: Column, exact: Boolean): Column =
    if (exact) count_distinct(c) else approx_count_distinct(c)

  /** Reference-parity windowed marginals (OpenFdaEtl.scala:110-136):
    * report-grain rows with the three distinct-report counts attached.
    *
    * @param exact substitute an exact per-window distinct count for HLL++.
    *              Spark rejects DISTINCT aggregates over windows, so exact
    *              mode is `size(collect_set(..))` — fine at the compat
    *              path's scale, and the construction the oracle gate needs
    *              (HLL++ sketches are engine-specific and never hash-match
    *              an exact-counting oracle — SURVEY §7.6.2).
    */
  def summaryStatisticsWindowed(df: DataFrame, exact: Boolean = false): DataFrame = {
    val wAdverses = Window.partitionBy(col("reaction_reactionmeddrapt"))
    val wDrugs = Window.partitionBy(col("chembl_id"))
    val wComb = Window.partitionBy(col("chembl_id"), col("reaction_reactionmeddrapt"))
    def dc(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
      if (exact) size(collect_set(c).over(w)).cast("long")
      else approx_count_distinct(c).over(w)
    df.withColumn("uniq_report_ids_by_reaction",
        dc(col("safetyreportid"), wAdverses))
      .withColumn("uniq_report_ids_by_drug",
        dc(col("safetyreportid"), wDrugs))
      .withColumn("uniq_report_ids",
        dc(col("safetyreportid"), wComb))
      .select("safetyreportid", "chembl_id", "reaction_reactionmeddrapt",
        "uniq_report_ids_by_reaction", "uniq_report_ids_by_drug", "uniq_report_ids")
  }

  /** Reference-parity pair-grain reduction (OpenFdaEtl.scala:138-160):
    * eager global distinct count (driver literal — A2), drop report id,
    * full-row distinct to pair grain, LLR columns, null/NaN filter.
    */
  def prepareForMonteCarloFromWindowed(reportGrain: DataFrame): DataFrame = {
    // persist before the eager count: the reference recomputes the whole
    // three-window plan twice (once for the driver-literal count, once for
    // the pair-grain distinct) — persisting first is the SURVEY §7.6.5
    // improvement, same results, one window pass
    val cached = reportGrain.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val uniqReports: Long =
      cached.select("safetyreportid").distinct().count()
    val pairGrain = cached
      .drop("safetyreportid")
      .withColumnRenamed("uniq_report_ids", "A")
      .withColumn("C", col("uniq_report_ids_by_drug") - col("A"))
      .withColumn("B", col("uniq_report_ids_by_reaction") - col("A"))
      .withColumn("D", lit(uniqReports) - col("uniq_report_ids_by_drug")
        - col("uniq_report_ids_by_reaction") + col("A"))
      .distinct()
      // eagerly materialize the (small, pair-grain) result so the
      // report-grain cache — the big frame — can be released before
      // returning: repeated calls in one session hold storage flat.
      // localCheckpoint blocks are freed by the ContextCleaner once the
      // returned frame is unreachable. Tradeoff, acceptable HERE only:
      // localCheckpoint truncates lineage, so a lost executor kills the
      // job instead of recomputing — this is the opt-in reference-compat
      // path (Pipeline defaults to pairStatistics, which keeps lineage);
      // a compat run that loses executors should simply be rerun.
      .localCheckpoint(true)
    cached.unpersist(false)
    withLLR(pairGrain)
  }

  /** Scale-path pair statistics from clean (report, drug, reaction) rows:
    * one aggregation to pair grain + two marginal aggregations joined back
    * (broadcast). Output column names match the reference's Monte-Carlo
    * input contract.
    *
    * @param exact exact count_distinct (oracle-matchable) vs HLL++
    *              (reference parity at scale)
    *
    * Rejected alternative, measured: a GROUPING SETS single-scan
    * formulation (one pass computing all four marginals) ran 3× SLOWER at
    * 8× scale — its 4-way Expand feeds the distinct-aggregate shuffle
    * with mostly-unique (pair, report) rows that cannot partial-reduce,
    * while the separate passes each collapse map-side. Scan count is not
    * the bottleneck; shuffle bytes are.
    */
  def pairStatistics(events: DataFrame, exact: Boolean = true): DataFrame = {
    val pairs = events.groupBy("chembl_id", "reaction_reactionmeddrapt")
      .agg(distinctCount(col("safetyreportid"), exact).as("A"))
    val byDrug = events.groupBy("chembl_id")
      .agg(distinctCount(col("safetyreportid"), exact).as("uniq_report_ids_by_drug"))
    val byReaction = events.groupBy("reaction_reactionmeddrapt")
      .agg(distinctCount(col("safetyreportid"), exact).as("uniq_report_ids_by_reaction"))
    // global distinct count as a broadcast 1-row frame, not an eager
    // driver-side action (the reference's A2 literal — kept literal only in
    // the parity path above): the whole statistic stays one lazy plan
    val total = events.select(distinctCount(col("safetyreportid"), exact).as("_total"))
    val pairGrain = pairs
      .join(broadcast(byDrug), Seq("chembl_id"))
      .join(broadcast(byReaction), Seq("reaction_reactionmeddrapt"))
      .crossJoin(broadcast(total))
      .withColumn("C", col("uniq_report_ids_by_drug") - col("A"))
      .withColumn("B", col("uniq_report_ids_by_reaction") - col("A"))
      .withColumn("D", col("_total") - col("uniq_report_ids_by_drug")
        - col("uniq_report_ids_by_reaction") + col("A"))
      .drop("_total")
    withLLR(pairGrain)
  }

  /** LLR columns + the null/NaN filter, exactly the reference expressions
    * (OpenFdaEtl.scala:152-157). Spark's log(x≤0) → null: pairs with A=0,
    * C=0 (via cterm) or non-positive D are silently dropped by the filter —
    * this is load-bearing reference semantics (SURVEY §7.6.1), not a bug.
    */
  def withLLR(pairGrain: DataFrame): DataFrame =
    pairGrain
      .withColumn("aterm", col("A") * (log(col("A")) - log(col("A") + col("B"))))
      .withColumn("cterm", col("C") * (log(col("C")) - log(col("C") + col("D"))))
      .withColumn("acterm", (col("A") + col("C")) *
        (log(col("A") + col("C")) - log(col("A") + col("B") + col("C") + col("D"))))
      .withColumn("llr", col("aterm") + col("cterm") - col("acterm"))
      .where(col("llr").isNotNull && !col("llr").isNaN)
}

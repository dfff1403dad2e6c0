package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling and dataset splitting.
  *
  * Reproducible train/val/test assignment is a correctness requirement
  * for a training-data pipeline: the same document must land in the
  * same split on every run, on every engine, regardless of partitioning
  * or row order — `rand()` and engine-native hashes (xxhash64) give
  * neither. This operator keys on the first 8 hex chars of md5(key),
  * compared lexicographically against per-split thresholds: md5 is
  * identical everywhere, and same-length lowercase-hex strings compare
  * exactly like the 32-bit integers they encode.
  *
  * Scale: a pure codegen'd row-local predicate — no shuffle, no state,
  * pushes through Catalyst like any filter.
  */
object HashSplit {

  /** First 8 hex chars of md5(key) — a uniform 32-bit draw rendered as
    * a lexicographically ordered string.
    */
  def hashPrefix(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Threshold literal: fraction p of the 32-bit space as 8-char hex. */
  def thresholdHex(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction out of range: $p")
    f"${math.min(math.floor(p * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Keep rows whose hash draw falls below `fraction` — a deterministic,
    * engine-portable Bernoulli sample keyed on content, not RNG.
    */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.where(hashPrefix(key) < lit(thresholdHex(fraction)))

  /** Per-stratum deterministic sampling (domain rebalancing /
    * temperature sampling): each stratum value keeps its own fraction,
    * strata absent from the map keep `defaultFraction`. Still a pure
    * row-local predicate — rebalancing a 100 TB corpus is a scan.
    */
  def sampleByStratum(df: DataFrame, key: Column, stratum: Column,
                      fractions: Map[String, Double],
                      defaultFraction: Double = 1.0): DataFrame = {
    val h = hashPrefix(key)
    val keep = fractions.foldLeft(
      when(lit(defaultFraction) >= 1.0, lit(true))
        .otherwise(h < lit(thresholdHex(defaultFraction)))) {
      case (acc, (value, p)) =>
        when(stratum === value,
          if (p >= 1.0) lit(true) else h < lit(thresholdHex(p))).otherwise(acc)
    }
    df.where(keep)
  }

  /** Deterministic mixture upsampling (epoch-weighted data mixing): a
    * row whose stratum has weight w is emitted floor(w) times plus one
    * more copy with probability frac(w), decided by hashing (key, copy
    * index) — so w = 2.5 means "2 or 3 epochs, reproducibly per doc",
    * and w < 1 downsamples. Output carries a `copy` column (0-based).
    * Still shuffle-free: a generate + filter over the scan.
    */
  def upsampleByWeight(df: DataFrame, key: Column, stratum: Column,
                       weights: Map[String, Double],
                       defaultWeight: Double = 1.0): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0), "weights must be >= 0")
    def chain[A](f: Double => Column): Column =
      weights.foldLeft(f(defaultWeight)) {
        case (acc, (value, w)) => when(stratum === value, f(w)).otherwise(acc)
      }
    val wt = chain(w => lit(w))
    val thr = chain(w => lit(thresholdHex(w - math.floor(w))))
    val copyDraw = hashPrefix(concat(key.cast("string"), lit(":"), col("copy").cast("string")))
    df.withColumn("_wt", wt).withColumn("_thr", thr)
      .where(col("_wt") > 0)
      .withColumn("copy",
        explode(sequence(lit(0), ceil(col("_wt")).cast("int") - 1)))
      .where(col("copy") < floor(col("_wt")) || copyDraw < col("_thr"))
      .drop("_wt", "_thr")
  }

  /** Per-group frequency cap (domain capping): keep at most
    * `maxPerGroup` rows per `group` value, chosen deterministically by
    * the md5 draw on (seed, id) with the id as tiebreak — the standard
    * "no domain may dominate the corpus" guard (C4 caps URLs, Gopher
    * caps domains). Output keeps the input columns plus the 1-based
    * `rank` within the group, so callers can tighten the cap later
    * without re-ranking.
    *
    * Scale: the rank is a per-group window — safe when groups are
    * bounded, but ONE hot domain (half the crawl is `blogspot.com`)
    * makes one window partition a straggler, and AQE does not split
    * window partitions. `saltBuckets > 0` switches to the two-phase
    * top-k shape: phase 1 ranks within (group, hash-salt bucket) and
    * keeps each bucket's local top `maxPerGroup` — every global
    * top-`maxPerGroup` row is necessarily in its bucket's local top-k,
    * so phase 2's exact window ranks ≤ saltBuckets·maxPerGroup
    * survivors per group instead of the full group. Results are
    * IDENTICAL with or without salt (pinned by unit test); only the
    * physical shape changes.
    */
  def capPerGroup(df: DataFrame, group: Column, maxPerGroup: Int,
                  id: Column, seed: Long = 0L,
                  saltBuckets: Int = 0): DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup must be >= 1, got $maxPerGroup")
    import org.apache.spark.sql.expressions.Window
    val draw = md5(concat(lit(s"cap:$seed:"), id.cast("string")))
    val pre =
      if (saltBuckets <= 0) df
      else {
        val bucket = pmod(xxhash64(id), lit(saltBuckets))
        val wLocal = Window.partitionBy(group, bucket)
          .orderBy(draw.asc, id.asc)
        df.withColumn("_lr", row_number().over(wLocal))
          .where(col("_lr") <= maxPerGroup).drop("_lr")
      }
    val w = Window.partitionBy(group).orderBy(draw.asc, id.asc)
    pre.withColumn("rank", row_number().over(w))
      .where(col("rank") <= maxPerGroup)
  }

  /** Per-group TOKEN-budget fill — "sample each domain/language down to
    * N tokens", the curation step that turns mixture WEIGHTS into an
    * actual corpus: rows are taken in the deterministic md5 draw order
    * (same family as [[capPerGroup]]) until the group's running token
    * sum reaches the budget. The row that crosses the line is INCLUDED
    * — budgets are targets, not ceilings, so a budget smaller than any
    * single document still yields one document; callers needing a hard
    * ceiling filter `cum_tokens <= budget` afterwards. Output adds
    * `cum_tokens`, the inclusive running sum in draw order, so a later
    * tightening of the budget is a filter, not a re-rank.
    *
    * Scale: a running sum is a per-group window; one hot domain makes a
    * straggler partition. `saltBuckets > 0` prunes first inside
    * (group, hash-salt bucket): a row's bucket-local prefix sum is a
    * LOWER bound on its global prefix sum (the bucket rows preceding it
    * are a subsequence of its global predecessors), so any row whose
    * local pre-sum already meets the budget is globally excluded and
    * can be dropped before the exact window — survivors per bucket are
    * bounded by budget tokens. Results are IDENTICAL with or without
    * salt (pinned by unit test); only the physical shape changes.
    */
  def takeToTokenBudget(df: DataFrame, group: Column, tokens: Column,
                        budget: Long, id: Column, seed: Long = 0L,
                        saltBuckets: Int = 0): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    takeToTokenBudgetCol(df, group, tokens, lit(budget), id, seed, saltBuckets)
  }

  /** [[takeToTokenBudget]] with a PER-ROW budget column — the form
    * mixture reweighting needs (each group fills to ITS OWN budget,
    * e.g. temperature-scaled targets joined in per group). The budget
    * expression must be constant within a group; all draw-order and
    * crossing-row semantics are identical to the literal form.
    */
  def takeToTokenBudgetCol(df: DataFrame, group: Column, tokens: Column,
                           budget: Column, id: Column, seed: Long = 0L,
                           saltBuckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val draw = md5(concat(lit(s"budget:$seed:"), id.cast("string")))
    val pre =
      if (saltBuckets <= 0) df
      else {
        val bucket = pmod(xxhash64(id), lit(saltBuckets))
        val wLocal = Window.partitionBy(group, bucket)
          .orderBy(draw.asc, id.asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("_lc", sum(tokens).over(wLocal))
          .where(col("_lc") - tokens < budget).drop("_lc")
      }
    val w = Window.partitionBy(group).orderBy(draw.asc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre.withColumn("cum_tokens", sum(tokens).over(w))
      .where(col("cum_tokens") - tokens < budget)
  }

  /** Temperature-scaled mixture budgets — the α-sampling recipe
    * multilingual/multi-source training mixes use (XLM-R, mT5):
    * p_g = tokens_g / Σ tokens, w_g = p_g^α / Σ p^α, budget_g =
    * round(w_g · totalTokens). α = 1 keeps natural proportions, α → 0
    * flattens toward uniform — low-resource groups get upsampled
    * relative to their share without any group ever being pinned to an
    * absolute count by hand.
    *
    * Engine portability: the power/ratio chain runs in a FIXED operation
    * order on exact integer token censuses, the weight is rounded to
    * 6 dp BEFORE the budget multiply, and the budget rounds to a whole
    * token — the same discipline as every log-based gate. One census
    * shuffle; the output is group-grain (tiny).
    *
    * Output: (grp, n_tokens, weight, budget).
    */
  def temperatureBudgets(docs: DataFrame, group: Column, tokens: Column,
                         alpha: Double, totalTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(totalTokens >= 1, s"totalTokens must be >= 1, got $totalTokens")
    val census = docs.groupBy(group.as("grp"))
      .agg(sum(tokens).as("n_tokens"))
    val powed = census.withColumn("_pa",
      pow(col("n_tokens").cast("double"), lit(alpha)))
    val tot = powed.agg(sum(col("_pa")).as("_tot"))
    powed.crossJoin(broadcast(tot))
      .withColumn("weight", round(col("_pa") / col("_tot"), 6))
      .withColumn("budget",
        greatest(round(col("weight") * totalTokens).cast("long"), lit(1L)))
      .select("grp", "n_tokens", "weight", "budget")
  }

  /** Materialize a temperature mix: per-group budgets from
    * [[temperatureBudgets]] broadcast-joined back, then the per-group
    * budget fill ([[takeToTokenBudgetCol]]) in the deterministic draw
    * order. Output: the kept docs with (grp, n_toks, cum_tokens,
    * budget) — tightening α later is a recompute of the tiny budget
    * table plus a filter, never a re-shuffle of the corpus.
    */
  def temperatureResample(docs: DataFrame, group: Column, tokens: Column,
                          alpha: Double, totalTokens: Long, id: Column,
                          seed: Long = 0L, saltBuckets: Int = 0): DataFrame = {
    // internal names only: the caller's frame may itself carry a "grp"
    val budgets = temperatureBudgets(docs, group, tokens, alpha, totalTokens)
      .select(col("grp").as("_bgrp"), col("budget"))
    val tagged = docs
      .withColumn("_grp", group)
      .withColumn("_ntk", tokens)
      .join(broadcast(budgets), col("_grp") === col("_bgrp"))
      .drop("_bgrp")
    // output columns (grp, n_toks) REPLACE same-named caller columns —
    // they carry the same values by construction
    takeToTokenBudgetCol(tagged, col("_grp"), col("_ntk"), col("budget"),
        id, seed, saltBuckets)
      .drop("grp").drop("n_toks")
      .withColumnRenamed("_grp", "grp")
      .withColumnRenamed("_ntk", "n_toks")
  }

  /** Assign each row to one named split with the given weights
    * (normalized to 1). Splits are disjoint, exhaustive, and stable
    * under any re-run or repartitioning.
    */
  def assignSplits(df: DataFrame, key: Column,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val h = hashPrefix(key)
    // last split is the unconditional otherwise → rounding in the final
    // threshold can never orphan a row
    val expr = splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), acc) => when(h < lit(thresholdHex(c)), name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe splitting: assign the split at GROUP grain (near-dup
    * cluster, registrable domain, author…) so no group straddles
    * train/test — the contamination the doc-grain [[assignSplits]]
    * cannot prevent (two near-copies hash to different splits and the
    * eval set silently contains training paraphrases). One distinct
    * pass to group grain, the same threshold ladder on the GROUP key,
    * and a broadcast-friendly join back; all doc-grain work stays a
    * scan. Output: input columns + `split`.
    */
  def groupSafeSplits(df: DataFrame, group: Column,
                      splits: Seq[(String, Double)]): DataFrame = {
    val g = df.select(group.cast("string").as("_grp")).distinct()
    val assigned = assignSplits(g, col("_grp"), splits)
    df.withColumn("_grp", group.cast("string"))
      .join(assigned, Seq("_grp"))
      .drop("_grp")
  }

  /** EXACT-count stratified split: within each stratum, rows are ranked
    * by the deterministic md5 draw (id tiebreak) and split i takes rank
    * range [floor(cumf_{i−1}·n_g), floor(cumf_i·n_g)) — so split sizes
    * are exact to the row (vs [[assignSplits]]' binomial jitter),
    * which is what a fixed-size eval panel or a budgeted val set
    * needs. The rank window partitions by STRATUM (bounded groups;
    * for one giant stratum use [[Shuffle]]'s two-phase shape); stratum
    * sizes ride a broadcast census join. floor of the double product
    * is engine-identical, so assignment replays exactly.
    *
    * Output: (id, stratum, split).
    */
  def exactStratifiedSplits(df: DataFrame, id: Column, stratum: Column,
                            splits: Seq[(String, Double)],
                            seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val cum = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val base = df.select(id.cast("long").as("id"),
      stratum.cast("string").as("stratum"))
    val draw = md5(concat(lit(s"xsplit:$seed:"), col("id").cast("string")))
    val w = Window.partitionBy("stratum")
      .orderBy(draw.asc, col("id").asc)
    val counts = base.groupBy("stratum").agg(count(lit(1)).as("_n"))
    val ranked = base
      .withColumn("_r", row_number().over(w).cast("long") - 1L)
      .join(broadcast(counts), Seq("stratum"))
    // last split is the unconditional otherwise — floor rounding can
    // never orphan a row
    val expr = splits.init.zip(cum.init)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), c), acc) =>
          when(col("_r") < floor(lit(c) * col("_n")), name).otherwise(acc)
      }
    ranked.select(col("id"), col("stratum"), expr.as("split"))
  }

  /** Purged temporal split with an embargo gap (walk-forward split,
    * López de Prado 2018 ch. 7): train = everything up to the cut time,
    * test = everything AFTER cut + embargo, and the rows inside the gap
    * are labeled `embargo` and belong to neither — the guard against
    * look-ahead leakage through temporally-correlated labels and
    * features (a label computed from a post-cut window, a rolling
    * feature whose window straddles the cut) that the hash ladders
    * above cannot express: their splits interleave in time by design.
    *
    * The cut is the EXACT k-th order statistic of the timestamp
    * (k = n·num div den — integer arithmetic, no float fraction),
    * found by [[HistQuantile.exactKth]]'s range-narrowing selection:
    * ≤5 census passes, no global sort, ≤2¹⁶ driver rows per pass.
    * Ties AT the cut timestamp all land in train (split on value, not
    * rank), so the train fraction is exact up to cut-time ties.
    * Assignment itself is one shuffle-free scan against two literals.
    *
    * Output: input columns + `split` ∈ train / embargo / test.
    */
  def temporalSplit(df: DataFrame, ts: Column, trainNum: Long,
                    trainDen: Long, embargoMicros: Long): DataFrame = {
    require(trainDen > 0 && trainNum > 0 && trainNum < trainDen,
      s"train fraction must be in (0, 1): $trainNum/$trainDen")
    require(embargoMicros >= 0, s"embargo must be >= 0, got $embargoMicros")
    val us = unix_micros(ts)
    val n = df.select(us.as("_us")).where(col("_us").isNotNull).count()
    require(n > 0, "temporalSplit needs at least one non-null timestamp")
    val k = math.max(1L, n * trainNum / trainDen)
    val cut = HistQuantile.exactKth(df.select(us.as("_us")), col("_us"), k)
      .select("kth").head().getLong(0)
    df.withColumn("split",
      when(us.isNull, lit(null).cast("string"))
        .when(us <= lit(cut), "train")
        .when(us <= lit(cut) + lit(embargoMicros), "embargo")
        .otherwise("test"))
  }
}

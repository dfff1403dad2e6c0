package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution hypothesis testing — the inference layer over the
  * drift monitors: PSI/KL say "how far apart", the two-sample
  * Kolmogorov–Smirnov test says "is the gap explainable by sampling
  * noise", and Benjamini–Hochberg keeps a FLEET of such monitors from
  * drowning the on-call in false alarms (at α=0.05, 200 per-slice
  * monitors fire ~10 false positives a day uncorrected). Beyond-
  * reference surface (SURVEY §2.13).
  *
  * Exactness: the KS statistic is pure integer arithmetic — at each
  * distinct value, |cumA·n_b − cumB·n_a| over the value census
  * (DECIMAL(38,0) products), D = max/(n_a·n_b) rounded once; the
  * asymptotic p-value's exp-series terms nano-round before the sum
  * (the libm rule). BH is integer products only (p·m ≤ α·rank).
  * Cumulatives use the two-phase range-shard shape (no global
  * window); BH ranks at TEST grain (one row per monitor — census
  * grain by construction).
  */
object Hypothesis {

  /** Two-sample KS test on an integer-valued column (micro-quantize
    * upstream for continuous data). One row:
    * (n_a, n_b, d_stat, p_value) — p from the asymptotic Kolmogorov
    * series 2·Σ(−1)^{j−1}e^{−2j²λ²}, λ = D·√(n_a·n_b/(n_a+n_b)),
    * 100 nano-rounded terms (null when either side is empty).
    */
  def ksTest(a: DataFrame, b: DataFrame, value: Column,
             shards: Int = 32): DataFrame = {
    val ca = a.select(value.cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("na"))
    val cb = b.select(value.cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("nb"))
    val census = ca.join(cb, Seq("v"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    val sharded = census.repartitionByRange(shards, col("v").asc)
      .withColumn("_shard", spark_partition_id()).cache()
    val totals = sharded.groupBy("_shard")
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def lookup(off: Array[(Int, Long)]): Column =
      if (off.isEmpty) lit(0L)
      else element_at(
        map(off.flatMap { case (s, o) => Seq(lit(s), lit(o)) }: _*),
        col("_shard"))
    val offA = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val offB = totals.map(_._1).zip(totals.map(_._3).scanLeft(0L)(_ + _))
    val w = Window.partitionBy("_shard").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = sharded
      .withColumn("cuma", lookup(offA) + sum(col("na")).over(w))
      .withColumn("cumb", lookup(offB) + sum(col("nb")).over(w))
    val na = totals.map(_._2).sum
    val nb = totals.map(_._3).sum
    val stat = cum.agg(
        max(abs(col("cuma").cast("decimal(38,0)") * lit(nb)
          - col("cumb").cast("decimal(38,0)") * lit(na))).as("_num"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        when(lit(na) > 0L && lit(nb) > 0L,
          round(col("_num").cast("double") / (lit(na).cast("double") * nb), 6))
          .as("d_stat"))
    stat.select(col("n_a"), col("n_b"), col("d_stat"),
        explode(sequence(lit(1), lit(100))).as("j"))
      .withColumn("_lam",
        col("d_stat") * sqrt(lit(na).cast("double") * nb / (na + nb)))
      .withColumn("_term",
        round(when(pmod(col("j"), lit(2)) === 1, lit(1.0d)).otherwise(lit(-1.0d))
          * exp(lit(-2.0d) * col("j") * col("j") * col("_lam") * col("_lam"))
          * 1e9).cast("long"))
      .groupBy("n_a", "n_b", "d_stat", "_lam")
      .agg(round(least(lit(1.0d), greatest(lit(0.0d),
        lit(2.0d) * sum(col("_term")).cast("double") / 1e9)), 6).as("_praw"))
      // the alternating series is only valid for λ bounded away from 0
      // (at λ=0 it oscillates ±1); below 0.2 the true tail prob is 1
      // to well past 6dp, so clamp — same guard in the oracle
      .select(col("n_a"), col("n_b"), col("d_stat"),
        when(col("_lam") < lit(0.2d), lit(1.0d)).otherwise(col("_praw"))
          .as("p_value"))
  }

  /** Grouped KS drift fleet — one KS test PER SLICE against the
    * whole-corpus baseline, entirely group-parallel (no driver loop):
    * the per-slice monitor whose p-values feed [[bhCorrect]] — the
    * actual production composition ("which sources drifted today,
    * FDR-controlled"). Slice-vs-whole is the standard PSI-style
    * baseline (the slice is part of the whole; the mild correlation is
    * the accepted monitoring convention).
    *
    * Shapes: one (group, value) census; the baseline cumulative is a
    * value-census-grain window, per-group cumulatives partition by
    * group; D and the p-series are the [[ksTest]] integer/nano
    * arithmetic at group grain. Output: (key, n_g, d_stat, p_value,
    * p_micro).
    */
  def ksTestByGroup(df: DataFrame, group: Column, value: Column,
                    shards: Int = 32): DataFrame = {
    val base = df.select(group.cast("string").as("g"),
      value.cast("long").as("v"))
    val gc = base.groupBy("g", "v").agg(count(lit(1)).as("n"))
    val vc = gc.groupBy("v").agg(sum(col("n")).as("nv"))
    val wAll = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cumAll = vc.withColumn("cumb", sum(col("nv")).over(wAll))
    val wG = Window.partitionBy("g").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = base.agg(count(lit(1)).as("nn"))
    val gtot = base.groupBy("g").agg(count(lit(1)).as("ng"))
    // DENSE group×value grid: both ECDFs jump only at observed values,
    // but a group's ECDF must be EVALUATED (carried forward) at every
    // baseline value too — sampling it only at the group's own rows
    // silently underestimates D whenever the baseline moves inside a
    // group-flat interval. G·V rows — value census bounded by contract
    // (integer/micro-bucketed monitor values).
    val cum = gtot.select(col("g"), col("ng"))
      .crossJoin(cumAll.select(col("v"), col("cumb")))
      .join(gc, Seq("g", "v"), "left_outer")
      .na.fill(0L, Seq("n"))
      .withColumn("cuma", sum(col("n")).over(wG))
    val d = cum.crossJoin(broadcast(tot))
      .groupBy("g", "ng", "nn")
      .agg(max(abs(col("cuma").cast("decimal(38,0)") * col("nn")
        - col("cumb").cast("decimal(38,0)") * col("ng"))).as("_num"))
      .select(col("g").as("key"), col("ng").as("n_g"),
        round(col("_num").cast("double")
          / (col("ng").cast("double") * col("nn")), 6).as("d_stat"),
        col("ng"), col("nn"))
    d.select(col("key"), col("n_g"), col("d_stat"),
        (col("d_stat") * sqrt(col("ng").cast("double") * col("nn")
          / (col("ng") + col("nn")))).as("_lam"),
        explode(sequence(lit(1), lit(100))).as("j"))
      .withColumn("_term",
        round(when(pmod(col("j"), lit(2)) === 1, lit(1.0d))
          .otherwise(lit(-1.0d))
          * exp(lit(-2.0d) * col("j") * col("j") * col("_lam") * col("_lam"))
          * 1e9).cast("long"))
      .groupBy("key", "n_g", "d_stat", "_lam")
      .agg(round(least(lit(1.0d), greatest(lit(0.0d),
        lit(2.0d) * sum(col("_term")).cast("double") / 1e9)), 6).as("_praw"))
      .select(col("key"), col("n_g"), col("d_stat"),
        when(col("_lam") < lit(0.2d), lit(1.0d)).otherwise(col("_praw"))
          .as("p_value"))
      .withColumn("p_micro", round(col("p_value") * 1e6).cast("long"))
  }

  /** Benjamini–Hochberg FDR correction: rank the m p-values ascending,
    * k* = the largest rank with p·m ≤ α·rank, flag ranks ≤ k* as
    * discoveries. Integer arithmetic only (p in micro units). Output:
    * (key, p_micro, rank, discovery).
    */
  def bhCorrect(pvals: DataFrame, alphaMicro: Long = 50000L,
                keyCol: String = "key",
                pCol: String = "p_micro"): DataFrame = {
    require(alphaMicro > 0, s"alpha must be positive, got $alphaMicro")
    val w = Window.orderBy(col(pCol).asc, col(keyCol).asc)
    val m = pvals.select(count(lit(1)).as("m"))
    val ranked = pvals
      .select(col(keyCol).as("key"), col(pCol).cast("long").as("p_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(m))
      .withColumn("_pass",
        col("p_micro") * col("m") <= lit(alphaMicro) * col("rank"))
    val kstar = ranked.agg(coalesce(max(when(col("_pass"), col("rank"))),
      lit(0L)).as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("key"), col("p_micro"), col("rank"),
        (col("rank") <= col("kstar")).as("discovery"))
  }

  /** Standard-normal CDF via the Abramowitz–Stegun 7.1.26 erf
    * polynomial (max abs error 1.5e-7 — below the 6dp output round):
    * elementary functions only, so BOTH engines evaluate the identical
    * chain and the result is hash-exact. One double chain; callers
    * round once.
    */
  private[operators] def normCdf(z: Column): Column = {
    val x = abs(z) / lit(math.sqrt(2.0))
    val t = lit(1.0d) / (lit(1.0d) + lit(0.3275911d) * x)
    val poly = t * (lit(0.254829592d) + t * (lit(-0.284496736d) +
      t * (lit(1.421413741d) + t * (lit(-1.453152027d) +
        t * lit(1.061405429d)))))
    val erf = lit(1.0d) - poly * exp(-(x * x))
    when(z >= 0, lit(0.5d) * (lit(1.0d) + erf))
      .otherwise(lit(0.5d) * (lit(1.0d) - erf))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) on an integer-valued
    * column — the RANK-based drift test next to [[ksTest]]: sensitive to
    * location shift where KS is sensitive to any ECDF gap, and the
    * standard choice for heavy-tailed metric comparisons (latencies,
    * quality scores) where a t-test's mean is meaningless.
    *
    * Exact integer core over the value census: with `before` = rows of
    * both samples strictly below v and `t` = rows tied at v, every row
    * at v has DOUBLED midrank 2·before + t + 1 (an integer — midranks
    * themselves are half-integers), so R2 = Σ na·(2·before + t + 1) and
    * the doubled statistic U2 = R2 − n_a(n_a+1) are exact DECIMAL(38,0)
    * sums. The normal approximation with the standard tie correction
    * (σ² = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))], Σ(t³−t) exact from
    * the same census) and the A&S Φ give a 6dp p-value (two-sided, no
    * continuity correction — documented contract, oracle replays the
    * same chain). Cumulatives use the two-phase range-shard shape (no
    * global window). Output one row: (n_a, n_b, u2_a, z, p_value).
    */
  def mannWhitney(a: DataFrame, b: DataFrame, value: Column,
                  shards: Int = 32): DataFrame = {
    val ca = a.select(value.cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("na"))
    val cb = b.select(value.cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("nb"))
    val census = ca.join(cb, Seq("v"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
      .withColumn("t", col("na") + col("nb"))
    val sharded = census.repartitionByRange(shards, col("v").asc)
      .withColumn("_shard", spark_partition_id()).cache()
    val totals = sharded.groupBy("_shard")
      .agg(sum(col("na")).as("ta"), sum(col("t")).as("tt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def lookup(off: Array[(Int, Long)]): Column =
      if (off.isEmpty) lit(0L)
      else element_at(
        map(off.flatMap { case (s, o) => Seq(lit(s), lit(o)) }: _*),
        col("_shard"))
    val offT = totals.map(_._1).zip(totals.map(_._3).scanLeft(0L)(_ + _))
    val w = Window.partitionBy("_shard").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val na = totals.map(_._2).sum
    val nb = totals.map(_._3).sum - na
    val n = na + nb
    val agg = sharded
      .withColumn("before", lookup(offT) + sum(col("t")).over(w) - col("t"))
      .agg(
        sum(col("na").cast("decimal(38,0)") *
          (lit(2L) * col("before") + col("t") + lit(1L))).as("r2"),
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t")
          - col("t")).as("ties"))
    agg.select(
        lit(na).as("n_a"), lit(nb).as("n_b"),
        (col("r2") - lit(na) * (lit(na) + lit(1L)).cast("decimal(38,0)"))
          .as("u2_a"),
        col("ties"))
      .withColumn("_ua", col("u2_a").cast("double") / 2.0d)
      .withColumn("_var",
        lit(na.toDouble * nb / 12.0d) *
          (lit(n + 1.0d) - col("ties").cast("double")
            / lit(n.toDouble * (n - 1.0d))))
      .withColumn("z",
        when(col("_var") > 0,
          round((col("_ua") - lit(na.toDouble * nb / 2.0d))
            / sqrt(col("_var")), 6)))
      .withColumn("p_value",
        when(col("z").isNull, lit(null).cast("double"))
          .otherwise(round(least(lit(1.0d),
            lit(2.0d) * (lit(1.0d) - normCdf(abs(col("z"))))), 6)))
      .select(col("n_a"), col("n_b"), col("u2_a").cast("long").as("u2_a"),
        col("z"), col("p_value"))
  }

  /** Chi-square test of independence between two categorical columns —
    * the drift test for label × slice contingency ("did the language
    * mix shift by source?"). χ² per cell from EXACT integer products:
    * term = (O·n − r·c)² / (n·r·c) with O, r, c, n all census longs;
    * each term nano-rounds before the association-order-free integer
    * sum. The p-value uses the Wilson–Hilferty cube-root normal
    * approximation (elementary functions only — χ² survival needs the
    * incomplete gamma, which neither engine's SQL has; WH error is
    * ~1e-2 at df = 1 shrinking fast with df, and the approximation is
    * the DOCUMENTED contract the oracle replays). Cell census is category²-bounded —
    * census grain by construction. Output one row:
    * (n, df, chi2, p_value).
    */
  def chiSquareIndependence(df: DataFrame, aCol: Column,
                            bCol: Column): DataFrame = {
    val cells = df.select(aCol.cast("string").as("a"),
        bCol.cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val cols_ = cells.groupBy("b").agg(sum(col("o")).as("c"))
    val nR = rows.count()
    val nC = cols_.count()
    val tot = cells.agg(sum(col("o")).as("n"))
    // DENSE grid: absent cells have O = 0 but still contribute E
    val grid = rows.crossJoin(cols_)
      .join(cells, Seq("a", "b"), "left_outer")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
    val dfree = (nR - 1L) * (nC - 1L)
    // the O·n − r·c difference is exact in DECIMAL(38,0); its square is
    // taken in DOUBLE (squaring in decimal could overflow 38 digits at
    // extreme n) — same order of operations in the oracle, so the 1-ulp
    // double rounding is engine-identical
    val terms = grid
      .withColumn("_diff",
        (col("o").cast("decimal(38,0)") * col("n")
          - col("r").cast("decimal(38,0)") * col("c")).cast("double"))
      .withColumn("_term",
        round(col("_diff") * col("_diff")
          / (col("n").cast("double") * col("r") * col("c")) * 1e9)
          .cast("long"))
    terms
      .agg(max(col("n")).as("n"),
        round(sum(col("_term")).cast("double") / 1e9, 6).as("chi2"))
      .select(col("n"), lit(dfree).as("df"), col("chi2"))
      .withColumn("_z",
        when(lit(dfree) > 0,
          // 6dp-rounded before Φ: pow/sqrt are libm — round the chain
          // once so a 1-ulp cross-engine difference can't leak into p
          round((pow(col("chi2") / lit(dfree.toDouble), lit(1.0d / 3))
            - (lit(1.0d) - lit(2.0d) / (9.0d * dfree)))
            / sqrt(lit(2.0d) / (9.0d * dfree)), 6)))
      .withColumn("p_value",
        when(col("_z").isNull, lit(null).cast("double"))
          .otherwise(round(least(lit(1.0d), greatest(lit(0.0d),
            lit(1.0d) - normCdf(col("_z")))), 6)))
      .select(col("n"), col("df"), col("chi2"), col("p_value"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
  * massive data streams") — confidence intervals for a corpus statistic
  * without resampling passes: each row joins replicate b with weight
  * w ~ Poisson(1), which approximates multinomial bootstrap resampling
  * but needs NO global coordination — the weight is a pure function of
  * (seed, replicate, row key). The training-data use: error bars on
  * quality-filter rates, mean document scores, A/B metric deltas —
  * anywhere a point estimate over sampled data gets shipped without
  * uncertainty. Beyond-reference surface (SURVEY §2.13).
  *
  * Determinism/portability: the Poisson draw is a CONSTANT THRESHOLD
  * LADDER over a 60-bit md5 uniform (the [[Dsir]] pattern) — cumulative
  * Poisson(1) CDF values are driver-computed double literals inlined
  * identically in the oracle, so every weight replays bit-for-bit.
  * Values go to micro longs BEFORE the weighted sum (exact integer
  * arithmetic); each replicate mean is ONE double chain rounded to 6dp.
  *
  * Scale shape: one corpus scan explodes each row to its B replicate
  * contributions, which PARTIAL-AGGREGATE map-side to a B-grain census
  * (B ≈ 20–100) — the shuffle carries partitions × B rows, not rows × B.
  * The CI selection is a window over the B-row census (census-grain by
  * construction). Weight tail is capped at 9 (P ≈ 1.1e-6 per draw —
  * negligible bias, bounded ladder).
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF thresholds c_0..c_8: u < c_k → weight k,
    * else 9.
    */
  private[graft] val thresholds: Seq[Double] = {
    val probs = (0 to 8).scanLeft(math.exp(-1.0)) { (p, k) => p / (k + 1) }
    probs.init.scanLeft(0.0)(_ + _).tail
  }

  private def poissonWeight(u: Column): Column =
    thresholds.zipWithIndex.reverse
      .foldLeft(lit(9): Column) { case (acc, (c, k)) =>
        when(u < lit(c), lit(k)).otherwise(acc)
      }

  /** Per-replicate weighted means of `value`: (b, n_eff, sum_micro,
    * mean). n_eff = Σw is the replicate's effective sample size.
    */
  def replicateMeans(df: DataFrame, value: Column, rowKey: Column,
                     b: Int, seed: Long = 42L): DataFrame = {
    require(b >= 2, s"need >= 2 replicates, got $b")
    val base = df.select(rowKey.cast("string").as("k"),
      round(value * 1e6).cast("long").as("x"))
    val reps = base.select(col("k"), col("x"),
      explode(sequence(lit(0), lit(b - 1))).as("b"))
    val u = (conv(substring(md5(concat(lit("boot:"), lit(seed.toString),
        lit(":"), col("b").cast("string"), lit(":"), col("k"))), 1, 15),
      16, 10).cast("double") + 0.5d) / 1.152921504606846976e18d
    reps.withColumn("w", poissonWeight(u).cast("long"))
      .groupBy(col("b").cast("long").as("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("x")).as("sum_micro"))
      .select(col("b"), col("n_eff"), col("sum_micro"),
        round(col("sum_micro").cast("double") / col("n_eff") / 1e6, 6)
          .as("mean"))
  }

  /** Grouped twin of [[replicateMeans]]: per-(group, replicate) means —
    * per-language/source error bars from the same one-scan map-side
    * combine, census now groups × B rows. Draw keys include the group,
    * so a row's weight differs across groups only through its key
    * (deterministic as ever). Output: (g, b, n_eff, sum_micro, mean).
    */
  def replicateMeansBy(df: DataFrame, group: Column, value: Column,
                       rowKey: Column, b: Int,
                       seed: Long = 42L): DataFrame = {
    require(b >= 2, s"need >= 2 replicates, got $b")
    val base = df.select(group.as("g"), rowKey.cast("string").as("k"),
      round(value * 1e6).cast("long").as("x"))
    val reps = base.select(col("g"), col("k"), col("x"),
      explode(sequence(lit(0), lit(b - 1))).as("b"))
    val u = (conv(substring(md5(concat(lit("boot:"), lit(seed.toString),
        lit(":"), col("b").cast("string"), lit(":"), col("k"))), 1, 15),
      16, 10).cast("double") + 0.5d) / 1.152921504606846976e18d
    reps.withColumn("w", poissonWeight(u).cast("long"))
      .groupBy(col("g"), col("b").cast("long").as("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("x")).as("sum_micro"))
      .select(col("g"), col("b"), col("n_eff"), col("sum_micro"),
        round(col("sum_micro").cast("double") / col("n_eff") / 1e6, 6)
          .as("mean"))
  }

  /** Percentile CI from the replicate census: order statistics at
    * ceil(α·B) and ceil((1−α)·B) (1-based), plus the full-data mean.
    * One row: (n_replicates, mean_full, ci_lo, ci_hi). The window runs
    * over the B-row census — census-grain by construction.
    */
  def meanCI(df: DataFrame, value: Column, rowKey: Column, b: Int,
             alpha: Double = 0.025, seed: Long = 42L): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val loRank = math.ceil(alpha * b).toLong.max(1L)
    val hiRank = math.ceil((1 - alpha) * b).toLong
    val reps = replicateMeans(df, value, rowKey, b, seed)
      .withColumn("r",
        row_number().over(Window.orderBy(col("mean").asc, col("b").asc))
          .cast("long"))
    val full = df.select(round(value * 1e6).cast("long").as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .select(round(col("sx").cast("double") / col("n") / 1e6, 6)
        .as("mean_full"))
    reps.agg(
        count(lit(1)).as("n_replicates"),
        max(when(col("r") === loRank, col("mean"))).as("ci_lo"),
        max(when(col("r") === hiRank, col("mean"))).as("ci_hi"))
      .crossJoin(broadcast(full))
      .select(col("n_replicates"), col("mean_full"), col("ci_lo"),
        col("ci_hi"))
  }
}

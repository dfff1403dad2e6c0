package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AdaBoost over decision stumps — the boosted upgrade of the
  * quality-classifier ladder ([[Classifier]] linear NB →
  * [[DecisionTree]] single tree → this ensemble), in the β-form
  * (Freund–Schapire multiplicative weights) chosen so the ENTIRE
  * training loop is exact integer arithmetic. Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Per round, over the same binned-census machinery as
  * [[DecisionTree]] (integer features, (x−lo)·bins div (hi−lo)):
  *  1. ONE (feature × bin) weighted label histogram shuffle — sums of
  *     MICRO weights, exact longs;
  *  2. the driver folds the bounded census into the best stump:
  *     per (feature, threshold) the majority class on each side
  *     (2·wp ≥ w, ties → positive) and the misclassified weight
  *     E = Σ_side min(wp, w−wp) — an EXACT INTEGER argmin ordered
  *     (E, feature, bin), no doubles anywhere;
  *  3. stop when 2·E ≥ W (weak learner no better than chance);
  *  4. β_micro = max(1, (2·E·1e6 + (W−E)) div (2·(W−E))) — integer
  *     half-up rounding of E/(W−E), exact on both engines;
  *  5. weight update: correctly-classified rows shrink,
  *     w′ = max(1, (w·β_micro) div 1e6) — exact integer, the ≥1 clamp
  *     keeps every row's weight alive for replay determinism.
  *
  * Training therefore replays verbatim in integer SQL
  * (`x_boost_train`). Serving ([[margin]]) needs the one
  * transcendental of the algorithm — α = ln(1e6/β_micro) — computed
  * once per ROUND from the exact integer β and micro-rounded (the
  * 6-decimal libm discipline used by every log-bearing gate); the
  * per-document margin Σ ±α_micro is then an exact integer sum again.
  *
  * 100 TB shape: `rounds` × ONE census shuffle (F·bins rows after
  * map-side combine) over a localCheckpointed (bins…, y, w)
  * projection; weight updates are shuffle-free narrow projections;
  * driver traffic is the census, never rows; serving is a codegen'd
  * CASE-sum scan.
  */
object Boost {

  /** One boosting round: split `feature` at `bin` (left = bin ≤ t),
    * `cl`/`cr` the side class votes, `errW`/`totW` the round's
    * misclassified / total micro weight, `betaMicro` the weight
    * multiplier.
    */
  final case class Stump(round: Int, feature: Long, bin: Long, cl: Long,
                         cr: Long, errW: Long, totW: Long, betaMicro: Long)

  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Train `rounds` stumps. Features as in [[DecisionTree.train]]:
    * (column, lo, hi) integer specs. May return fewer than `rounds`
    * stumps (early stop at 2·E ≥ W).
    */
  def train(df: DataFrame, label: Column,
            features: Seq[(Column, Long, Long)], rounds: Int,
            bins: Int = 16): Seq[Stump] = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1,64], got $rounds")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(features.nonEmpty, "need at least one feature")
    features.foreach { case (_, lo, hi) =>
      require(hi > lo, s"feature domain [$lo, $hi) is empty") }
    val f = features.size
    val binCols = features.zipWithIndex.map { case ((c, lo, hi), i) =>
      DecisionTree.binColumn(c, lo, hi, bins).as(s"_b$i") }
    // LAZY pins throughout (the Scc/CC discipline): each round's census
    // collect() materializes the current weight frame in the same job,
    // so a boosting round costs one driver-synced job, not two
    var cur = df.select(binCols :+
        label.cast("boolean").cast("long").as("_y"): _*)
      .where(col("_y").isNotNull)
      .withColumn("_w", lit(1000000L))
      .localCheckpoint(false)

    val out = scala.collection.mutable.ArrayBuffer.empty[Stump]
    var r = 1
    var stopped = false
    while (r <= rounds && !stopped) {
      val census = cur
        .select(col("_y"), col("_w"),
          posexplode(array((0 until f).map(i => col(s"_b$i")): _*))
            .as(Seq("_f", "_bin")))
        .groupBy("_f", "_bin")
        .agg(sum("_w").as("sw"),
          sum(when(col("_y") === 1L, col("_w")).otherwise(0L)).as("swp"))
        .collect()
        .map(row => (row.getInt(0), row.getLong(1),
          row.getLong(2), row.getLong(3)))
      val w = census.filter(_._1 == 0).map(_._3).sum
      val wp = census.filter(_._1 == 0).map(_._4).sum
      var best: Option[(Long, Int, Long, Long, Long)] = None // (E, f, t, cl, cr)
      for (fi <- 0 until f) {
        val hist = Array.fill(bins)((0L, 0L))
        census.filter(_._1 == fi).foreach { case (_, b, sw, swp) =>
          hist(b.toInt) = (sw, swp) }
        var wL = 0L; var wpL = 0L
        var t = 0
        while (t <= bins - 2) {
          wL += hist(t)._1; wpL += hist(t)._2
          val wR = w - wL; val wpR = wp - wpL
          val cl = if (2 * wpL >= wL) 1L else 0L
          val cr = if (2 * wpR >= wR) 1L else 0L
          val e = math.min(wpL, wL - wpL) + math.min(wpR, wR - wpR)
          if (best.isEmpty || e < best.get._1) best = Some((e, fi, t, cl, cr))
          t += 1
        }
      }
      best match {
        case Some((e, fi, t, cl, cr)) if 2 * e < w =>
          // BigInt numerator: 2·e·1e6 wraps Long once total micro weight
          // passes ~9.2e12 (≈9M rows at the 1e6 initial weight); the
          // quotient itself is ≤1e6 so the result always fits.
          val beta = ((BigInt(2) * e * 1000000L + (w - e)) /
            (BigInt(2) * (w - e))).max(BigInt(1)).toLong
          out += Stump(r, fi.toLong, t, cl, cr, e, w, beta)
          val pred = when(col(s"_b$fi") <= t, lit(cl)).otherwise(lit(cr))
          cur = cur.withColumn("_w",
            when(pred === col("_y"),
              greatest(lit(1L), idiv(col("_w") * beta, lit(1000000L))))
              .otherwise(col("_w")))
            .localCheckpoint(false)
        case _ => stopped = true
      }
      r += 1
    }
    out.toSeq
  }

  /** Stump table as a DataFrame (gate / persistence surface). */
  def stumpFrame(spark: org.apache.spark.sql.SparkSession,
                 stumps: Seq[Stump]): DataFrame = {
    import spark.implicits._
    stumps.toDF()
  }

  /** Serving: per-row ensemble margin Σ_r (h_r(x) = 1 ? +α_r : −α_r)
    * in exact micro units, α_r = round(ln(1e6/β_r)·1e6) computed once
    * per round from the exact integer β (driver-side, micro-rounded —
    * the libm 6-decimal discipline). Adds `margin_micro` and `pred`
    * (margin ≥ 0) to `df`; a codegen'd shuffle-free scan.
    */
  def margin(df: DataFrame, features: Seq[(Column, Long, Long)],
             stumps: Seq[Stump], bins: Int = 16): DataFrame = {
    require(stumps.nonEmpty, "empty ensemble")
    val binned = features.zipWithIndex.map { case ((c, lo, hi), i) =>
      DecisionTree.binColumn(c, lo, hi, bins).as(s"_b$i") }
    val withBins = df.select(col("*") +: binned: _*)
    val terms = stumps.map { s =>
      val alpha = math.round(math.log(1e6 / s.betaMicro) * 1e6)
      val h = when(col(s"_b${s.feature}") <= s.bin, lit(s.cl))
        .otherwise(lit(s.cr))
      when(h === 1L, lit(alpha)).otherwise(lit(-alpha))
    }
    withBins
      .withColumn("margin_micro", terms.reduce(_ + _))
      .withColumn("pred", (col("margin_micro") >= 0L).cast("long"))
      .drop(features.indices.map(i => s"_b$i"): _*)
  }
}

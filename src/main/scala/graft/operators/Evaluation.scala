package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation — the measurement leg the quality-filter
  * family ([[Classifier]], [[QualityFilter]], [[Dsir]]) was missing:
  * you don't ship a data filter on its decision boundary alone, you
  * ship it on its ROC/PR curves and calibration against a labeled
  * slice. Beyond-reference surface (SURVEY §2.13); the ranking twin is
  * `Retrieval.ndcgAt` (graded relevance), this file covers the binary
  * label case.
  *
  * All metrics work on a SCORED frame (id, integer micro score, boolean
  * label) and reduce it immediately to a SCORE-GRAIN census
  * (score_micro, n_pos, n_neg) — one partial-aggregated shuffle; every
  * curve statistic is census arithmetic after that. Ranks over the
  * census use the two-phase shape (range-repartition by score →
  * per-shard running sums → broadcast shard-offset map), NOT a
  * single-partition global window, so a 100 TB score distribution with
  * ~distinct micro scores still ranks in parallel (same shape as
  * `Salience.vocabulary` / `Shuffle.deterministicShuffle`).
  *
  * Exactness: scores are already integer micro log-odds, so tie groups
  * are well-defined; AUC's tie-corrected rank-sum numerator
  * Σ n_pos(s)·(2·cumneg_below(s) + n_neg(s)) is pure integer
  * arithmetic summed in DECIMAL(38,0) (a level's product stays within
  * long while tie-mass × 2N < 2⁶³ — micro-grain scores keep tie masses
  * tiny; the SUM gets decimal headroom regardless), and the single
  * double division rounds once at the end. AP and ECE round each
  * per-level/per-bin term to integer units BEFORE the sum (the
  * [[Pca]]/[[EmbeddingDrift]] census rule), so no float accumulates in
  * any association-order-dependent aggregate and a SQL engine replays
  * every metric hash-exactly.
  */
object Evaluation {

  /** Score-grain census: (s, n_pos, n_neg) — the only pass over the
    * scored corpus; everything downstream is census arithmetic.
    */
  def scoreCensus(scored: DataFrame, scoreCol: String = "score_micro",
                  labelCol: String = "label"): DataFrame =
    scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))

  /** Census + exact cumulative negatives strictly BELOW each score
    * level, via the two-phase shard shape: contiguous score ranges per
    * shard (range repartition), a per-shard running sum, and a
    * broadcast shard-offset lookup — no single-partition window.
    * Cached so the offset pass and the rank pass see the same shards.
    */
  private def censusWithCumBelow(census: DataFrame, shards: Int): DataFrame = {
    val sharded = census
      .repartitionByRange(shards, col("s").asc)
      .withColumn("_shard", spark_partition_id())
      .cache()
    val totals = sharded.groupBy("_shard")
      .agg(sum(col("n_neg")).as("tn"), sum(col("n_pos")).as("tp"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val negOff = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val posOff = totals.map(_._1)
      .zip(totals.map(_._3).scanLeft(0L)(_ + _))
    def lookup(off: Array[(Int, Long)]): Column =
      if (off.isEmpty) lit(0L)
      else element_at(
        map(off.flatMap { case (sh, o) => Seq(lit(sh), lit(o)) }: _*),
        col("_shard"))
    val w = Window.partitionBy("_shard").orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("cumneg_below",
        lookup(negOff) + coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .withColumn("cumpos_below",
        lookup(posOff) + coalesce(sum(col("n_pos")).over(w), lit(0L)))
  }

  /** ROC AUC by the tie-corrected Mann–Whitney rank-sum:
    * AUC = Σ_s n_pos(s)·(cumneg_below(s) + n_neg(s)/2) / (P·N),
    * computed ×2 in integers and divided once. One row:
    * (n_pos, n_neg, auc) — auc null when either class is empty.
    */
  def rocAuc(scored: DataFrame, scoreCol: String = "score_micro",
             labelCol: String = "label", shards: Int = 32): DataFrame = {
    val c = censusWithCumBelow(scoreCensus(scored, scoreCol, labelCol), shards)
    c.agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum((col("n_pos") * (lit(2L) * col("cumneg_below") + col("n_neg")))
          .cast("decimal(38,0)")).as("_num2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("_num2").cast("double")
            / (lit(2.0d) * col("n_pos") * col("n_neg")), 6))
          .as("auc"))
  }

  /** Per-slice ROC AUC — the fairness/regression view ("does the
    * quality filter rank as well on zh as on en"): the tie-corrected
    * rank-sum per GROUP, computed on the (group, score) census with
    * group-partitioned cumulative windows (bounded groups; census
    * grain within each). One row per group:
    * (grp, n_pos, n_neg, auc — null for single-class slices).
    */
  def rocAucBy(scored: DataFrame, group: Column,
               scoreCol: String = "score_micro",
               labelCol: String = "label"): DataFrame = {
    val census = scored.groupBy(group.cast("string").as("grp"),
        col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg"))
    val w = Window.partitionBy("grp").orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("cumneg_below",
        coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .groupBy("grp")
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"),
        sum((col("n_pos") * (lit(2L) * col("cumneg_below") + col("n_neg")))
          .cast("decimal(38,0)")).as("_num2"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("_num2").cast("double")
            / (lit(2.0d) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Average precision (area under the PR curve, ties processed as one
    * level, precision evaluated AFTER the whole tie group — the
    * standard step interpolation): AP = Σ_s n_pos(s)·prec(s) / P with
    * prec(s) = cumpos_incl(s) / cumall_incl(s) over DESCENDING score.
    * Each level's precision rounds to nano units before the weighted
    * integer sum (decimal accumulator), so the result replays exactly.
    * One row: (n_pos, n_neg, ap).
    */
  def averagePrecision(scored: DataFrame, scoreCol: String = "score_micro",
                       labelCol: String = "label",
                       shards: Int = 32): DataFrame = {
    val c = censusWithCumBelow(scoreCensus(scored, scoreCol, labelCol), shards)
    val tot = c.agg(sum(col("n_pos")).as("p_tot"),
      sum(col("n_neg")).as("n_tot"))
    // descending-order cumulative inclusive of the level = total − below
    val lev = c.crossJoin(broadcast(tot))
      .select(col("n_pos"), col("p_tot"), col("n_tot"),
        (col("p_tot") - col("cumpos_below")).as("cump_incl"),
        (col("p_tot") - col("cumpos_below")
          + col("n_tot") - col("cumneg_below")).as("cumall_incl"))
      .withColumn("prec_nano",
        round(col("cump_incl").cast("double") / col("cumall_incl") * 1e9)
          .cast("long"))
    lev.agg(first(col("p_tot")).as("n_pos"), first(col("n_tot")).as("n_neg"),
        sum((col("n_pos") * col("prec_nano")).cast("decimal(38,0)"))
          .as("_ap_nano"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L,
          round(col("_ap_nano").cast("double") / 1e9 / col("n_pos"), 6))
          .as("ap"))
  }

  /** Precision-targeted threshold solver — "set the quality filter for
    * 95% precision and tell me the recall I pay": for each target in
    * the grid, the LOWEST score threshold (max recall) whose
    * predict-positive-iff-score≥θ precision still clears the target.
    * Pure integer arithmetic on the score census (precision ≥ t ⇔
    * tp·10⁶ ≥ t_micro·(tp+fp) — no division), cumulatives two-phase.
    * Output per target: (target_micro, threshold_micro, tp, fp,
    * precision, recall) — nulls when no threshold qualifies.
    */
  def thresholdForPrecision(scored: DataFrame,
                            targetsMicro: Seq[Long] = Seq(500000L, 800000L,
                              900000L, 950000L),
                            scoreCol: String = "score_micro",
                            labelCol: String = "label",
                            shards: Int = 32): DataFrame = {
    require(targetsMicro.nonEmpty && targetsMicro.forall(t =>
      t >= 0 && t <= 1000000L), s"targets must be micro in [0,1e6]")
    val c = censusWithCumBelow(scoreCensus(scored, scoreCol, labelCol), shards)
    val tot = c.agg(sum(col("n_pos")).as("p_tot"),
      sum(col("n_neg")).as("n_tot"))
    val grid = scored.sparkSession.range(1)
      .select(explode(array(targetsMicro.map(lit): _*)).as("target_micro"))
    val lev = c.crossJoin(broadcast(tot))
      .select(col("s"), col("p_tot"), col("n_tot"),
        (col("p_tot") - col("cumpos_below")).as("tp"),
        (col("n_tot") - col("cumneg_below")).as("fp"))
    val passing = lev.crossJoin(broadcast(grid))
      .where(col("tp") * lit(1000000L) >=
        col("target_micro") * (col("tp") + col("fp")))
      // lowest qualifying threshold = max tp; ties to the LOWER score
      .groupBy("target_micro")
      .agg(max(struct(col("tp"), (-col("s")).as("_ns"), col("fp"),
        col("p_tot"))).as("_best"))
      .select(col("target_micro"),
        (-col("_best._ns")).as("threshold_micro"),
        col("_best.tp").as("tp"), col("_best.fp").as("fp"),
        round(col("_best.tp").cast("double")
          / (col("_best.tp") + col("_best.fp")), 6).as("precision"),
        round(col("_best.tp").cast("double") / col("_best.p_tot"), 6)
          .as("recall"))
    grid.join(passing, Seq("target_micro"), "left_outer")
  }

  /** Reliability diagram at fixed-width SCORE-bucket grain (integer
    * `div`, clamped to [loBin, hiBin] so the tails don't explode the
    * bin census): per bin the observed positive rate and the predicted
    * probability from the bin's exact mean micro log10-odds through the
    * base-10 logistic 1/(1+10^(−m)) — both rounded to micro BEFORE the
    * gap so [[calibrationError]] stays integer-exact. Shuffle count: 1.
    */
  def calibration(scored: DataFrame, scoreCol: String = "score_micro",
                  labelCol: String = "label", binWidthMicro: Long = 1000000L,
                  loBin: Long = -8L, hiBin: Long = 8L): DataFrame =
    scored
      .select(
        greatest(lit(loBin), least(lit(hiBin),
          floor(col(scoreCol) / lit(binWidthMicro)))).as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("y"),
        col(scoreCol).as("sm"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("sm")).as("_ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n") * 1e6).cast("long")
          .as("obs_micro"),
        round(lit(1e6) / (lit(1.0d)
          + pow(lit(10.0d), -(col("_ssum").cast("double") / col("n") / 1e6))))
          .cast("long").as("pred_micro"))
      .withColumn("gap_micro", abs(col("obs_micro") - col("pred_micro")))

  /** Expected calibration error over [[calibration]]'s bins:
    * ECE = Σ n_b·|obs_b − pred_b| / N on the micro-integer gaps
    * (decimal accumulator — no float sum). One row: (n, n_bins, ece).
    */
  def calibrationError(scored: DataFrame, scoreCol: String = "score_micro",
                       labelCol: String = "label",
                       binWidthMicro: Long = 1000000L, loBin: Long = -8L,
                       hiBin: Long = 8L): DataFrame =
    calibration(scored, scoreCol, labelCol, binWidthMicro, loBin, hiBin)
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_bins"),
        sum((col("n") * col("gap_micro")).cast("decimal(38,0)"))
          .as("_gsum"))
      .select(col("n"), col("n_bins"),
        round(col("_gsum").cast("double") / col("n") / 1e6, 6).as("ece"))

  /** Isotonic calibration via pool-adjacent-violators on the
    * [[calibration]] bin census — the nonparametric recalibration that
    * fixes what a reliability diagram only diagnoses: bin-wise observed
    * rates forced monotone non-decreasing in score by merging adjacent
    * violating pools, each bin's calibrated probability = its pool's
    * pooled positive rate. Unlike Platt scaling there is no parametric
    * form to mis-fit, which is why production score recalibration
    * defaults to isotonic.
    *
    * Exactness: PAV runs ENTIRELY on integers — pools carry exact
    * (n, n_pos) and the violation test is the cross-multiplied
    * pos_prev·n_top > pos_top·n_prev; the output probability is the
    * shared round-half-up integer division (2·pos·10⁶ + n) div (2n).
    * The fold itself is census-grain by construction (≤ hiBin − loBin
    * + 1 rows collected to the driver — the [[Pca]]/model-frame
    * contract), while the corpus-sized work is the one bin-census
    * shuffle. The oracle replays the pooling as a recursive CTE with
    * one append-or-merge action per step (≤ 2·bins steps).
    *
    * Output: (bin, n, n_pos, iso_micro), iso monotone in bin.
    */
  def isotonicCalibration(scored: DataFrame,
                          scoreCol: String = "score_micro",
                          labelCol: String = "label",
                          binWidthMicro: Long = 1000000L, loBin: Long = -8L,
                          hiBin: Long = 8L): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val census = scored
      .select(
        greatest(lit(loBin), least(lit(hiBin),
          floor(col(scoreCol) / lit(binWidthMicro)))).as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV: ascending-bin stack of pools; merge while the top's rate
    // drops below its predecessor's (integer cross-multiply)
    final case class Pool(n: Long, pos: Long, bins: Int)
    val stack = scala.collection.mutable.ArrayBuffer[Pool]()
    for ((_, n, pos) <- census) {
      stack += Pool(n, pos, 1)
      var merging = true
      while (merging && stack.size >= 2) {
        val top = stack(stack.size - 1); val prev = stack(stack.size - 2)
        if (prev.pos * top.n > top.pos * prev.n) {
          stack.remove(stack.size - 1); stack.remove(stack.size - 1)
          stack += Pool(prev.n + top.n, prev.pos + top.pos,
            prev.bins + top.bins)
        } else merging = false
      }
    }
    val iso = stack.iterator.flatMap { p =>
      val v = (2L * p.pos * 1000000L + p.n) / (2L * p.n)
      Iterator.fill(p.bins)(v)
    }.toSeq
    census.zip(iso).map { case ((bin, n, pos), v) => (bin, n, pos, v) }
      .toSeq.toDF("bin", "n", "n_pos", "iso_micro")
  }

  /** Confusion matrix + derived rates at a decision threshold
    * (predicted positive ⇔ score > threshold). One partial-agg shuffle
    * to ONE row: (tp, fp, fn, tn, precision, recall, f1, accuracy) —
    * each rate a single exact-integer division rounded to 6 dp, null
    * when its denominator is 0.
    */
  def confusionAt(scored: DataFrame, thresholdMicro: Long = 0L,
                  scoreCol: String = "score_micro",
                  labelCol: String = "label"): DataFrame = {
    val pred = col(scoreCol) > lit(thresholdMicro)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    scored
      .agg(cnt(pred && col(labelCol)).as("tp"),
        cnt(pred && !col(labelCol)).as("fp"),
        cnt(!pred && col(labelCol)).as("fn"),
        cnt(!pred && !col(labelCol)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0L,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fn") > 0L,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          round(lit(2.0d) * col("tp")
            / (lit(2L) * col("tp") + col("fp") + col("fn")), 6)).as("f1"),
        round((col("tp") + col("tn")).cast("double")
          / (col("tp") + col("fp") + col("fn") + col("tn")), 6)
          .as("accuracy"))
  }

  /** Group fairness audit of a thresholded classifier — the governance
    * twin of [[rocAucBy]]: per-slice POSITIVE RATE (demographic parity),
    * TPR and FPR (equalized odds), each with its gap against the pooled
    * population rate, and the equalized-odds gap max(|ΔTPR|, |ΔFPR|)
    * (Hardt, Price, Srebro — NeurIPS 2016). A filtering model that
    * admits one language or source at a far lower rate than the pool is
    * exactly what this surfaces before a corpus ships.
    *
    * Determinism contract: counts are exact BIGINTs; each rate is ONE
    * double division rounded at 6dp; each gap is the difference of two
    * such rounded rates, rounded again at 6dp — identical bit-chains on
    * any IEEE engine (the [[rocAucBy]] convention). Rates with empty
    * denominators (a slice with no positives has no TPR) are null, and
    * the EO gap degrades to the gap that exists (null only if both do).
    *
    * Scale shape: ONE partial-aggregable shuffle to slice grain (the
    * census is |slices| rows — languages, sources: small by nature),
    * then a broadcast cross join of the one-row pooled frame. No
    * windows, no second pass over rows.
    */
  def fairnessBy(scored: DataFrame, group: Column,
                 thresholdMicro: Long = 0L,
                 scoreCol: String = "score_micro",
                 labelCol: String = "label"): DataFrame = {
    val pred = col(scoreCol) > lit(thresholdMicro)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    def counts(df: org.apache.spark.sql.RelationalGroupedDataset) =
      df.agg(cnt(pred && col(labelCol)).as("tp"),
        cnt(pred && !col(labelCol)).as("fp"),
        cnt(!pred && col(labelCol)).as("fn"),
        cnt(!pred && !col(labelCol)).as("tn"))
    def rate(num: Column, den: Column): Column =
      when(den > 0L, round(num.cast("double") / den, 6))
    def rates(df: DataFrame, p: String): DataFrame = df.select(
      df.columns.map(col) :+
        rate(col("tp") + col("fp"),
          col("tp") + col("fp") + col("fn") + col("tn")).as(p + "pos_rate") :+
        rate(col("tp"), col("tp") + col("fn")).as(p + "tpr") :+
        rate(col("fp"), col("fp") + col("tn")).as(p + "fpr"): _*)
    val byGrp = rates(counts(scored.groupBy(group.as("grp"))), "")
    val pool = rates(counts(scored.groupBy()), "pool_")
      .select(col("pool_pos_rate"), col("pool_tpr"), col("pool_fpr"))
    def gap(a: String, b: String): Column = round(col(a) - col(b), 6)
    byGrp.crossJoin(broadcast(pool))
      .select(col("grp"),
        (col("tp") + col("fp") + col("fn") + col("tn")).as("n"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        col("pos_rate"), col("tpr"), col("fpr"),
        gap("pos_rate", "pool_pos_rate").as("dp_gap"),
        gap("tpr", "pool_tpr").as("tpr_gap"),
        gap("fpr", "pool_fpr").as("fpr_gap"),
        greatest(
          coalesce(abs(gap("tpr", "pool_tpr")), abs(gap("fpr", "pool_fpr"))),
          coalesce(abs(gap("fpr", "pool_fpr")), abs(gap("tpr", "pool_tpr"))))
          .as("eo_gap"))
  }
}

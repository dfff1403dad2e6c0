package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise association rules (Agrawal–Imieliński–Swami): for item
  * pairs that co-occur in enough baskets, the directed rules a→b with
  * support, confidence, lift, leverage, and conviction — the
  * market-basket / co-consumption primitive behind "users who did X
  * also did Y", feature co-occurrence audits, and tag-dictionary
  * mining. Completes the event-analytics family next to
  * [[Covisitation]] (which ranks raw pair counts but carries no
  * directed strength or independence baseline).
  *
  * Semantics: a basket contributes each item ONCE (presence, not
  * multiplicity). Thresholds are micro fractions compared in EXACT
  * integer cross-multiplication (n_both·1e6 ≥ minSupportMicro·B —
  * never a float gate); the reported metrics are single-division
  * doubles (support, confidence, lift — bit-identical IEEE) or one
  * short rounded chain (leverage, conviction; conviction null at
  * confidence 1, its infinite point).
  *
  * Scale shape: one distinct shuffle to presence grain, a per-basket
  * self-join whose fan-out is quadratic in DISTINCT ITEMS PER BASKET
  * (bounded by the item vocabulary by contract — event types, tags,
  * product categories; for open vocabularies cap upstream — the
  * [[LinkPrediction]] maxDegree / maxDf discipline), then pair-grain
  * partial aggs. The basket total rides a broadcast 1-row frame; no
  * windows, no driver data path.
  */
object AssociationRules {

  /** Directed rules passing both thresholds:
    * (antecedent, consequent, n_baskets, n_ante, n_cons, n_both,
    * support, confidence, lift, leverage, conviction).
    */
  def rules(df: DataFrame, basket: Column, item: Column,
            minSupportMicro: Long, minConfidenceMicro: Long): DataFrame = {
    require(minSupportMicro >= 0 && minSupportMicro <= 1000000L,
      s"minSupportMicro in [0, 1e6], got $minSupportMicro")
    require(minConfidenceMicro >= 0 && minConfidenceMicro <= 1000000L,
      s"minConfidenceMicro in [0, 1e6], got $minConfidenceMicro")
    val tx = df.select(basket.cast("string").as("bk"),
        item.cast("string").as("it"))
      .distinct().localCheckpoint()
    val b = tx.select(countDistinct(col("bk")).as("n_baskets"))
    val items = tx.groupBy(col("it")).agg(count(lit(1)).as("n_it"))
    val pairs = tx.select(col("bk"), col("it").as("ia"))
      .join(tx.select(col("bk"), col("it").as("ib")), Seq("bk"))
      .where(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("n_both"))
    // both rule directions from each unordered pair
    val directed = pairs.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("n_both"))
      .unionByName(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("n_both")))
      .join(broadcast(items).withColumnRenamed("it", "antecedent")
        .withColumnRenamed("n_it", "n_ante"), Seq("antecedent"))
      .join(broadcast(items).withColumnRenamed("it", "consequent")
        .withColumnRenamed("n_it", "n_cons"), Seq("consequent"))
      .crossJoin(broadcast(b))
    directed
      .where(col("n_both") * lit(1000000L)
        >= lit(minSupportMicro) * col("n_baskets"))
      .where(col("n_both") * lit(1000000L)
        >= lit(minConfidenceMicro) * col("n_ante"))
      .select(col("antecedent"), col("consequent"), col("n_baskets"),
        col("n_ante"), col("n_cons"), col("n_both"),
        (col("n_both").cast("double") / col("n_baskets")).as("support"),
        (col("n_both").cast("double") / col("n_ante")).as("confidence"),
        (col("n_both").cast("double") * col("n_baskets")
          / (col("n_ante").cast("double") * col("n_cons"))).as("lift"),
        round(col("n_both").cast("double") / col("n_baskets")
          - (col("n_ante").cast("double") / col("n_baskets"))
            * (col("n_cons").cast("double") / col("n_baskets")), 6)
          .as("leverage"),
        when(col("n_both") =!= col("n_ante"),
          round((lit(1.0d) - col("n_cons").cast("double")
              / col("n_baskets"))
            / (lit(1.0d) - col("n_both").cast("double")
              / col("n_ante")), 6)).as("conviction"))
  }
}

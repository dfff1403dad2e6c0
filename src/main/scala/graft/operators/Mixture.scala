package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture-rate solver — turn "train on 30% code, 50% web, 20% books"
  * into per-source sampling factors: given observed per-source token
  * counts and target mixture WEIGHTS, compute each source's token
  * target under a total budget and the factor (target/observed) that
  * [[HashSplit.upsampleByWeight]] / [[HashSplit.sampleByStratum]]
  * then execute (factor > 1 ⇒ epochs of upsampling, < 1 ⇒ a
  * downsample rate). The missing planning step between "I have these
  * sources" and the deterministic samplers. Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Pure census arithmetic: one token-count shuffle to source grain,
  * one broadcast total-weight row; target = round(budget·w/Σw) and
  * factor = round(target/observed, 6) are single deterministic double
  * chains from exact longs, so the whole plan replays. Output:
  * (source, tokens, weight, target_tokens, factor, mode).
  */
object Mixture {

  def solveRates(docs: DataFrame, weights: Map[String, Double],
                 budgetTokens: Long, defaultWeight: Double = 1.0,
                 groupCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0),
      "weights must be >= 0")
    val census = docs
      .select(col(groupCol).as("source"),
        size(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))))
          .as("_n"))
      .groupBy("source")
      .agg(coalesce(sum(col("_n")), lit(0L)).cast("long").as("tokens"))
      .withColumn("w", weights.foldLeft(lit(defaultWeight): Column) {
        case (acc, (v, w)) => when(col("source") === v, lit(w)).otherwise(acc)
      })
    val tot = census.agg(sum(col("w")).as("wtot"))
    census.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        round(col("w"), 6).as("weight"),
        round(lit(budgetTokens) * (col("w") / col("wtot"))).cast("long")
          .as("target_tokens"))
      .withColumn("factor",
        when(col("tokens") > 0L,
          round(col("target_tokens").cast("double") / col("tokens"), 6)))
      .withColumn("mode",
        when(col("target_tokens") > col("tokens"), "upsample")
          .when(col("target_tokens") < col("tokens"), "downsample")
          .otherwise("keep"))
  }
}

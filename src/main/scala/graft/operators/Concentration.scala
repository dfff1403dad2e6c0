package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-concentration statistics over a group census — the questions
  * a mixture review asks before [[Raking]]/[[HashSplit]] rebalance:
  * how UNEQUAL is the source/language/domain contribution (Gini), how
  * DIVERSE is it (Shannon entropy), and how much of the corpus do the
  * top-k groups own (coverage curve)? All census-grain: one partial-agg
  * shuffle to (group, cnt), then windows over the census (bounded by
  * the group domain — the [[HistQuantile]] rule). Beyond-reference
  * surface (SURVEY §2.13).
  *
  * Determinism: Gini is assembled from exact integer sums (Σ i·x_(i)
  * with the (cnt, group) total order) and finished with ONE double
  * chain; entropy micro-rounds each −p·ln p term BEFORE the sum, so
  * the total is an exact long sum of engine-identical terms
  * (association-order-free — the [[Retrieval]] rule).
  */
object Concentration {

  /** Group census: (g, cnt). */
  def census(df: DataFrame, group: Column): DataFrame =
    df.groupBy(group.as("g")).agg(count(lit(1)).as("cnt"))

  /** One row: (n_groups, total, gini). Gini over the census masses,
    * G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n, with x ascending (ties broken
    * by group value so the rank is total).
    */
  def gini(censusDf: DataFrame): DataFrame = {
    val w = Window.orderBy(col("cnt").asc, col("g").asc)
    censusDf
      .withColumn("i", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("i") * col("cnt")).as("ix"))
      .select(col("n").as("n_groups"), col("s").as("total"),
        round(lit(2.0d) * col("ix") / (col("n") * col("s"))
          - (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
  }

  /** One row: (n_groups, total, entropy_nats, entropy_norm). Each
    * −p·ln p term is micro-rounded before the exact long sum;
    * entropy_norm divides by ln(n) (1.0 = uniform mix). Null when a
    * single group holds everything (ln 1 = 0 denominator).
    */
  def entropy(censusDf: DataFrame): DataFrame = {
    val tot = censusDf.agg(sum(col("cnt")).as("s"),
      count(lit(1)).as("n"))
    val terms = censusDf.crossJoin(broadcast(tot))
      .select(col("n"), col("s"),
        round(-(col("cnt").cast("double") / col("s"))
          * log(col("cnt").cast("double") / col("s")) * 1e6)
          .cast("long").as("t_micro"))
    terms.groupBy("n", "s").agg(sum(col("t_micro")).as("h_micro"))
      .select(col("n").as("n_groups"), col("s").as("total"),
        round(col("h_micro").cast("double") / 1e6, 6).as("entropy_nats"),
        when(col("n") > 1,
          round(col("h_micro").cast("double") / 1e6 / log(col("n").cast("double")), 6))
          .as("entropy_norm"))
  }

  /** Coverage curve: (rank, g, cnt, cum_share) with groups in (cnt
    * desc, g asc) order — "the top k groups own cum_share of the
    * corpus". Census-grain window.
    */
  def coverage(censusDf: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = Window.orderBy(col("cnt").desc, col("g").asc)
    val cum = Window.orderBy(col("cnt").desc, col("g").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = censusDf.agg(sum(col("cnt")).as("s"))
    censusDf
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(cum))
      .where(col("rank") <= topK)
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("g"), col("cnt"),
        round(col("cum").cast("double") / col("s"), 6).as("cum_share"))
  }
}

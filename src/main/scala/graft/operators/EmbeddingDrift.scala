package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space drift — the REPRESENTATION twin of the value-space
  * PSI monitor: when the upstream encoder or the content mix shifts,
  * per-dimension centroid positions move before any scalar metric
  * does. Compares two embedding snapshots (yesterday/today, train/
  * serve) at DIMENSION grain: per-dim means from exact micro sums, the
  * centroid cosine, and the worst per-dim shift. Beyond-reference
  * surface (SURVEY §2.13).
  *
  * Portability: each element micro-rounds BEFORE the sum (exact long
  * census — the [[Pca]] moment rule), per-dim means are one double
  * chain, and the centroid cosine is one chain over three
  * micro-rounded-mean dot sums. Scale shape: ONE partial-agg shuffle
  * per side to a dim-grain census (d rows, never vectors); everything
  * after is census arithmetic.
  */
object EmbeddingDrift {

  /** Per-dim census: (dim, s_micro, n) — exact long sums of
    * micro-rounded elements.
    */
  private def census(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim"), round(col("v").cast("double") * 1e6)
        .cast("long").as("vm"))
      .groupBy("dim")
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))

  /** Per-dim report: (dim, mean_a, mean_b, shift) with shift =
    * |mean_b − mean_a|, means 6dp.
    */
  def perDim(a: DataFrame, b: DataFrame,
             vecCol: String = "embedding"): DataFrame = {
    val ca = census(a, vecCol).select(col("dim"), col("s").as("sa"),
      col("n").as("na"))
    val cb = census(b, vecCol).select(col("dim"), col("s").as("sb"),
      col("n").as("nb"))
    ca.join(cb, Seq("dim"))
      .select(col("dim").cast("long").as("dim"),
        round(col("sa").cast("double") / col("na") / 1e6, 6).as("mean_a"),
        round(col("sb").cast("double") / col("nb") / 1e6, 6).as("mean_b"),
        round(abs(col("sb").cast("double") / col("nb") / 1e6
          - col("sa").cast("double") / col("na") / 1e6), 6).as("shift"))
  }

  /** One-row summary: (n_dims, centroid_cosine, max_shift) — the alert
    * line. Centroid cosine uses the micro-rounded per-dim MEANS (exact
    * long dot sums, one final double chain), so it replays exactly.
    */
  def summary(a: DataFrame, b: DataFrame,
              vecCol: String = "embedding"): DataFrame = {
    val ca = census(a, vecCol).select(col("dim"), col("s").as("sa"),
      col("n").as("na"))
    val cb = census(b, vecCol).select(col("dim"), col("s").as("sb"),
      col("n").as("nb"))
    val m = ca.join(cb, Seq("dim"))
      .select(col("dim"),
        round(col("sa").cast("double") / col("na")).cast("long").as("ma"),
        round(col("sb").cast("double") / col("nb")).cast("long").as("mb"))
    m.agg(count(lit(1)).as("n_dims"),
        sum(col("ma") * col("mb")).as("_ab"),
        sum(col("ma") * col("ma")).as("_aa"),
        sum(col("mb") * col("mb")).as("_bb"))
      .select(col("n_dims"),
        round(col("_ab").cast("double")
          / (sqrt(col("_aa").cast("double")) * sqrt(col("_bb").cast("double"))),
          6).as("centroid_cosine"))
      .crossJoin(broadcast(
        perDim(a, b, vecCol).agg(max(col("shift")).as("max_shift"))))
  }
}

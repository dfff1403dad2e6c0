package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969)
  * — the DECISION layer over a blocking stage ([[SortedNeighborhood]],
  * [[SetSimJoin]], LSH): each candidate pair gets a log-likelihood
  * weight Σ_f log₂(m_f/u_f) over agreeing fields (+ log₂((1−m_f)/(1−u_f))
  * over disagreeing ones), then a three-way link / possible / non-link
  * verdict by thresholds. m_f = P(field agrees | true match),
  * u_f = P(field agrees | random pair). The entity-resolution use: fold
  * the same document/author/site appearing under different keys before
  * counting it twice in a training mix. Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Portability: per-field weights are constants computed ONCE (driver,
  * log₂, rounded to integer micro-bits); the pair score is then a SUM
  * OF CONSTANT LONGS selected by boolean agreement — exact integer
  * arithmetic, association-order-free, replayed verbatim by the oracle
  * (which inlines the same micro constants).
  *
  * Scale shape: scoring is a shuffle-free codegen projection over the
  * candidate-pair frame (the blocking stage bounds the pair count);
  * [[uEstimate]] is census-grain — Σ_v p_v² per field needs one
  * partial-agg value census, never a pair sample.
  */
object RecordLinkage {

  /** One comparison field: `agree` is a boolean Column over the PAIR
    * frame (e.g. lang_a === lang_b); m/u are the FS conditional
    * agreement probabilities, 0 < u < m < 1.
    */
  final case class FsField(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1 for field $name, got m=$m u=$u")
    /** log₂(m/u) in micro-bits — the agreement reward. */
    def agreeMicro: Long = math.round(math.log(m / u) / math.log(2.0) * 1e6)
    /** log₂((1−m)/(1−u)) in micro-bits — the disagreement penalty (< 0). */
    def disagreeMicro: Long =
      math.round(math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6)
  }

  /** Pair scores: input columns + one `w_<field>` per field + the total
    * `fs_micro` (micro-bits, exact long sum).
    */
  def score(pairs: DataFrame, fields: Seq[FsField]): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    val withW = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"w_${f.name}",
        when(f.agree, lit(f.agreeMicro)).otherwise(lit(f.disagreeMicro)))
    }
    withW.withColumn("fs_micro",
      fields.map(f => col(s"w_${f.name}")).reduce(_ + _))
  }

  /** Three-way verdict: link if fs ≥ upper, non-link if fs ≤ lower,
    * possible (clerical review) between.
    */
  def classify(scored: DataFrame, upperMicro: Long,
               lowerMicro: Long): DataFrame = {
    require(lowerMicro < upperMicro,
      s"need lower < upper, got $lowerMicro >= $upperMicro")
    scored.withColumn("verdict",
      when(col("fs_micro") >= upperMicro, lit("link"))
        .when(col("fs_micro") <= lowerMicro, lit("nonlink"))
        .otherwise(lit("possible")))
  }

  /** u-probability estimate per field from the VALUE CENSUS: for a
    * random pair, P(agree on f) = Σ_v p_v² — one partial-agg census per
    * field, Σ cnt² as an exact long, one double division rounded to
    * micro. Feed the result into [[FsField]] (m comes from labeled
    * match pairs or EM). Output: (field, u_micro).
    */
  def uEstimate(df: DataFrame, fields: Map[String, Column]): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    fields.toSeq.sortBy(_._1).map { case (name, value) =>
      df.select(value.as("v")).groupBy("v").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("sq"), sum(col("c")).as("n"))
        .select(lit(name).as("field"),
          round(col("sq") * lit(1e6) / (col("n") * col("n")))
            .cast("long").as("u_micro"))
    }.reduce(_ unionByName _)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MedDRA code annotation — the reference's `addMedDraPreferredTerms`
  * (/root/reference .. stage/OpenFdaEtl.scala:167-191): left-outer join
  * preferred terms then low-level terms on the normalized reaction name,
  * prefer pt_code over llt_code, and dedupe the join fanout per
  * (drug, reaction) pair (added in reference v1.1.2).
  *
  * Both MedDRA vocabularies are tiny (≈10⁵ terms) → Catalyst
  * auto-broadcasts; explicit hints keep that true under any threshold.
  */
object Meddra {

  /** @param deterministic reference uses first-row-wins dropDuplicates
    *   (nondeterministic pick among multiple matching codes — SURVEY
    *   §7.6.3); `true` picks the smallest meddraCode per pair instead.
    */
  def annotate(pairs: DataFrame, meddraPt: DataFrame, meddraLlt: DataFrame,
               deterministic: Boolean = true): DataFrame = {
    val withPt = pairs.join(broadcast(meddraPt),
      pairs("reaction_reactionmeddrapt") === meddraPt("pt_name"), "left_outer")
    val withLlt = withPt.join(broadcast(meddraLlt),
      withPt("reaction_reactionmeddrapt") === meddraLlt("llt_name"), "left_outer")
    val coded = withLlt
      .withColumn("meddraCode", coalesce(col("pt_code"), col("llt_code")))
      .drop("pt_name", "llt_name", "pt_code", "llt_code")
    if (deterministic) {
      val w = Window.partitionBy(col("chembl_id"), col("reaction_reactionmeddrapt"))
        .orderBy(col("meddraCode").asc_nulls_last)
      coded.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    } else {
      coded.dropDuplicates(Seq("chembl_id", "reaction_reactionmeddrapt"))
    }
  }

  /** P9: the no-MedDRA fallback literal (OpenFdaEtl.scala:46). */
  def withEmptyCode(pairs: DataFrame): DataFrame =
    pairs.withColumn("meddraCode", typedLit[String](""))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten cascade — the deletion sweep a 100 TB corpus
  * owes its takedown/GDPR queue: given a forget-set of doc ids, purge
  * every DERIVED artifact (chunk tables, fingerprint sets, embedding
  * stores, indexes) that still carries the key, and produce the audit
  * evidence that the sweep was total. Beyond-reference surface
  * (SURVEY §2.13).
  *
  * [[purge]] is one broadcast left_anti per table (forget-sets are
  * small relative to the corpus — takedown queues, not corpora).
  * [[audit]] measures each table in ONE pass (broadcast flag join +
  * a single aggregate — no separate before/after count jobs), so the
  * audit costs one scan per table, which is the minimum any evidence
  * of deletion can cost.
  */
object Forget {

  /** The table minus the forget-set — one anti join. */
  def purge(table: DataFrame, forget: DataFrame,
            keyCol: String = "doc_id"): DataFrame =
    table.join(broadcast(forget.select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** One audit row per table: (table, n_before, n_removed, n_after),
    * each measured in one scan. n_after is derived, not re-counted —
    * the arithmetic IS the left_anti semantics.
    */
  def audit(forget: DataFrame, tables: Seq[(String, DataFrame)],
            keyCol: String = "doc_id"): DataFrame = {
    require(tables.nonEmpty, "audit needs at least one table")
    val f = forget.select(col(keyCol)).distinct()
      .withColumn("_forget", lit(true))
    tables.map { case (name, df) =>
      df.join(broadcast(f), Seq(keyCol), "left_outer")
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("_forget"), 1L).otherwise(0L)).as("n_removed"))
        .select(lit(name).as("table"), col("n_before"), col("n_removed"),
          (col("n_before") - col("n_removed")).as("n_after"))
    }.reduce(_ unionByName _)
  }
}

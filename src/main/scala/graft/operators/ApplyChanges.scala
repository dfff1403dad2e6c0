package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge — the ingestion primitive of the incremental daily loop
  * (SURVEY §2.13): apply a keyed changeset (upserts + deletes) to a
  * snapshot, and derive SCD2 validity history from a full change log.
  * Beyond-reference surface; the Delta/Hudi MERGE INTO semantics
  * re-expressed as plain joins + windows so it runs on vanilla parquet.
  *
  * Semantics are last-writer-wins per key by a totally-ordered
  * `seq` column (ties must not exist — callers with same-instant
  * writers should compose seq as (ts, source_id)); `op` is `"upsert"`
  * or `"delete"`, anything else rejects at plan time.
  *
  * 100 TB shape: [[apply]] is one shuffle of the changeset (latest-per-
  * key window, changeset-sized, i.e. increment-proportional) plus one
  * equi-join against the snapshot on the key — broadcast when the day's
  * increment is small, shuffle-hash otherwise; the snapshot is never
  * windowed or re-sorted. [[history]] is one shuffle of the change log
  * on the key with a per-key sort — log-proportional, the unavoidable
  * grain of versioning. No driver data path anywhere.
  */
object ApplyChanges {

  private def checkOps(changes: DataFrame): DataFrame = {
    // reject unknown ops at the first action rather than silently
    // dropping them: an unknown op is a producer bug, not data
    changes.withColumn("op",
      when(col("op").isin("upsert", "delete"), col("op"))
        .otherwise(raise_error(concat(lit("ApplyChanges: unknown op "), col("op")))))
  }

  /** Latest change per key: row_number over (key ORDER BY seq DESC) = 1.
    * Changeset-sized shuffle; the snapshot is untouched.
    */
  def latestPerKey(changes: DataFrame, key: String, seq: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(seq).desc)
    checkOps(changes)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** New snapshot = old snapshot minus touched keys, plus the payloads
    * of latest upserts. Deletes simply fail to re-appear. Columns of
    * `snapshot` and `changes` must agree on everything except
    * (`op`, `seq`), which are dropped from the result.
    */
  def apply(snapshot: DataFrame, changes: DataFrame, key: String,
            seq: String): DataFrame = {
    val latest = latestPerKey(changes, key, seq)
    val untouched = snapshot.join(latest.select(key), Seq(key), "left_anti")
    val upserts = latest.where(col("op") === "upsert").drop("op", seq)
    untouched.unionByName(upserts.select(snapshot.columns.map(col).toSeq: _*))
  }

  /** SCD2 validity intervals from a full change log: each version is
    * valid from its own seq until the next change of the same key
    * (lead window), open-ended (null) for the current version.
    * `is_current` marks the last version; a current `delete` row is the
    * tombstone — [[snapshotOf]] filters it out.
    */
  def history(changeLog: DataFrame, key: String, seq: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(seq))
    checkOps(changeLog)
      .withColumn("valid_from", col(seq))
      .withColumn("valid_to", lead(col(seq), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The snapshot a change log implies as of `asOf` (inclusive): the
    * last version per key with seq ≤ asOf, minus tombstones. Pass
    * `None` for the latest snapshot.
    */
  def snapshotOf(changeLog: DataFrame, key: String, seq: String,
                 asOf: Option[Column] = None): DataFrame = {
    val bounded = asOf.map(b => changeLog.where(col(seq) <= b)).getOrElse(changeLog)
    latestPerKey(bounded, key, seq)
      .where(col("op") === "upsert")
      .drop("op")
  }

  /** Log retention/compaction: every change with seq < `beforeSeq`
    * collapses to its latest-per-key survivor (keys whose last
    * pre-horizon op is a delete vanish entirely — the tombstone has
    * done its job); changes at/after the horizon are kept verbatim.
    * Contract: [[snapshotOf]] at ANY asOf ≥ beforeSeq − 1 is identical
    * on the vacuumed and original logs — history BEFORE the horizon is
    * deliberately no longer replayable (that IS retention). At 100 TB
    * this is what keeps the change log from growing without bound:
    * the compacted prefix is snapshot-sized, not history-sized, and the
    * operation is one latest-per-key window over the expired prefix
    * only (increment-proportional in steady state when run on a rolling
    * horizon).
    */
  def vacuum(changeLog: DataFrame, key: String, seq: String,
             beforeSeq: Long): DataFrame = {
    val expired = changeLog.where(col(seq) < beforeSeq)
    val kept = changeLog.where(col(seq) >= beforeSeq)
    latestPerKey(expired, key, seq)
      .where(col("op") === "upsert")
      .unionByName(kept)
  }
}

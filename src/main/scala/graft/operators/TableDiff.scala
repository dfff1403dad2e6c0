package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the change-data-capture DESCRIBE next to
  * [[ApplyChanges]]'s merge: given yesterday's and today's version of a
  * keyed table, report exactly which keys were added, removed, or
  * changed — and for changed rows, WHICH columns moved. The audit
  * primitive behind "what did the upstream refresh actually touch",
  * dataset-release changelogs, and debugging a merge gone wrong;
  * unchanged rows (the overwhelming majority) never leave the join.
  *
  * Comparison is NULL-SAFE per column (`<=>` — a null→value flip IS a
  * change, null→null is not); `changed_cols` lists the moved columns
  * in schema order, so the output is deterministic without any sort.
  *
  * Scale shape: ONE full-outer hash join on the key columns (the only
  * shuffle), a codegen'd struct compare per matched row, and an output
  * bounded by the CHANGE volume, not the table. No windows, no driver
  * data path. Both snapshots must share the compared schema (enforced).
  */
object TableDiff {

  /** (keys..., change, changed_cols): change ∈ 'added' | 'removed' |
    * 'changed'; changed_cols null except for 'changed' rows, where it
    * lists the differing non-key columns in schema order. Identical
    * rows are dropped.
    */
  def diff(before: DataFrame, after: DataFrame,
           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val cols = before.columns.toSeq
    require(after.columns.toSeq == cols,
      s"snapshots must share a schema: ${cols.mkString(",")} vs " +
        after.columns.mkString(","))
    val nonKeys = cols.filterNot(keys.contains)
    val b = before.select(keys.map(col) :+
      struct(nonKeys.map(col): _*).as("_b") :+ lit(1).as("_inb"): _*)
    val a = after.select(keys.map(col) :+
      struct(nonKeys.map(col): _*).as("_a") :+ lit(1).as("_ina"): _*)
    val j = b.join(a, keys, "full_outer")
    val changedCols = filter(
      array(nonKeys.map(c =>
        when(!(col(s"_b.$c") <=> col(s"_a.$c")), lit(c))): _*),
      x => x.isNotNull)
    j.withColumn("change",
        when(col("_inb").isNull, "added")
          .when(col("_ina").isNull, "removed")
          .when(!(col("_b") <=> col("_a")), "changed"))
      .where(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed", changedCols))
      .select(keys.map(col) :+ col("change") :+ col("changed_cols"): _*)
  }
}

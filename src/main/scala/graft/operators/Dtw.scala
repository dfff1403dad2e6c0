package graft.operators

import graft.functions.DtwDistance
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group DTW distance to a reference series (see
  * [[graft.functions.DtwDistance]] for the kernel): "which metric
  * streams moved like the reference, allowing for lag" — the
  * tempo-tolerant companion to [[Forecast]]'s pointwise error and
  * [[Smoothing]]'s filters. Typical call: each event type's (or
  * tenant's, or shard's) daily volume curve against a golden series;
  * a curve that ramps a day late is CLOSE under DTW and far under
  * Euclidean.
  *
  * Alignment contract: both sides are densified onto the REFERENCE's
  * bucket grid (missing buckets = 0 — natural for count/sum series),
  * so every group compares over the same exact length. Series length is
  * calendar-bounded by contract (days/hours — census grain); DTW is
  * O(len·band) per group after that, inside one codegen'd projection.
  *
  * Scale shape: one partial-agg shuffle to (group × bucket) census,
  * a groups×grid densify join, one collect_list per group AT CENSUS
  * GRAIN, broadcast 1-row reference, zero driver data path.
  */
object Dtw {

  /** (key, len, dtw, dtw_per_step): exact long DTW of each group's
    * bucket-summed series vs the reference frame's (bucket, value)
    * series, both densified to the reference grid; dtw_per_step =
    * dtw/(len_g + len_ref), one exact-integer division. Null dtw iff
    * no band-feasible path (band < 0 after densify never happens —
    * lengths match by construction).
    */
  def toReference(df: DataFrame, group: Column, bucket: Column,
                  value: Column, ref: DataFrame, refBucket: Column,
                  refValue: Column, band: Int): DataFrame = {
    require(band >= 0, s"band must be >= 0, got $band")
    val refCensus = ref.groupBy(refBucket.as("b"))
      .agg(sum(refValue.cast("long")).as("v"))
    val grid = refCensus.select(col("b"))
    val yRow = refCensus.groupBy()
      .agg(sort_array(collect_list(struct(col("b"), col("v")))).as("_s"))
      .select(transform(col("_s"), x => x.getField("v")).as("ys"))
    val gv = df.groupBy(group.cast("string").as("key"), bucket.as("b"))
      .agg(sum(value.cast("long")).as("v"))
    val dense = gv.select(col("key")).distinct()
      .crossJoin(grid)
      .join(gv, Seq("key", "b"), "left_outer")
      .na.fill(0L, Seq("v"))
    dense.groupBy("key")
      .agg(sort_array(collect_list(struct(col("b"), col("v")))).as("_s"))
      .select(col("key"),
        transform(col("_s"), x => x.getField("v")).as("xs"))
      .crossJoin(broadcast(yRow))
      .select(col("key"), size(col("xs")).as("len"),
        DtwDistance.dtwDistance(col("xs"), col("ys"), lit(band)).as("dtw"))
      .crossJoin(broadcast(yRow.select(size(col("ys")).as("_ny"))))
      .withColumn("dtw_per_step",
        col("dtw").cast("double")
          / (col("len") + col("_ny")).cast("double"))
      .drop("_ny")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single change-point detection over a time-bucket census — "when did
  * the level of this metric shift?" (ingestion-rate steps, a source
  * turning on/off, a quality regression landing). The standard
  * least-squares formulation: the split s minimizing SSE_left +
  * SSE_right, equivalently MAXIMIZING the between-segment term
  * f(s) = (n_l·S_r − n_r·S_l)² / (n_l·n_r·n) — computed here from
  * exact prefix sums (n_l, S_l are longs), one double chain per split,
  * 6dp-rounded with the split index as tie-break, so the argmax is
  * deterministic and the SQL oracle replays it. Beyond-reference
  * surface (SURVEY §2.13).
  *
  * Scale shape: the corpus collapses to the BUCKET CENSUS first (one
  * partial-agg shuffle; buckets are bounded by the time range / bucket
  * width, not by rows). Everything after — prefix sums, per-split
  * scores, the top-1 — runs at census grain; the unpartitioned windows
  * are census-bounded by construction (the [[HistQuantile]] rule).
  * For multiple change points, recurse on the segments (binary
  * segmentation) — k driver-bounded rounds of this operator.
  */
object Changepoint {

  /** Bucket census of `df`: (bucket, cnt). */
  def census(df: DataFrame, bucket: Column): DataFrame =
    df.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt"))

  /** Best single split of a (bucket, cnt) census: one row with
    * (split_bucket, n_left, n_right, mean_left, mean_right, score).
    * The split point is the FIRST bucket of the right segment; buckets
    * are segment positions, cnt the metric. `minSeg` buckets are
    * required on each side (guards degenerate end splits).
    */
  def bestSplit(censusDf: DataFrame, minSeg: Int = 2): DataFrame = {
    require(minSeg >= 1, s"minSeg must be >= 1, got $minSeg")
    val ord = Window.orderBy(col("bucket"))
    val all = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pre = censusDf
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("nl", col("i") - 1)
      .withColumn("sl", coalesce(sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", count(lit(1)).over(all).cast("long"))
      .withColumn("s", sum(col("cnt")).over(all))
    val scored = pre
      .where(col("nl") >= minSeg && (col("n") - col("nl")) >= minSeg)
      .withColumn("nr", col("n") - col("nl"))
      .withColumn("sr", col("s") - col("sl"))
      // exact long d = nl·sr − nr·sl (≤ ~1e10·buckets — long-safe at
      // census grain), then ONE double chain, rounded once
      .withColumn("d", col("nl") * col("sr") - col("nr") * col("sl"))
      .withColumn("score",
        round(col("d").cast("double") * col("d")
          / (col("nl") * col("nr")) / col("n"), 6))
    scored
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("score").desc, col("bucket").asc)))
      .where(col("_rk") === 1)
      .select(col("bucket").as("split_bucket"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        round(col("sl").cast("double") / col("nl"), 6).as("mean_left"),
        round(col("sr").cast("double") / col("nr"), 6).as("mean_right"),
        col("score"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — points joined to intervals on containment,
  * `p ∈ [start, end)`. Beyond-reference surface (SURVEY §2.13).
  *
  * Spark has NO native range-join strategy: the naive
  * `points.join(intervals, p >= start && p < end)` plans a
  * BroadcastNestedLoopJoin (or a cartesian), which is quadratic and the
  * classic silent scale-killer of event-interval workloads. The
  * standard fix, implemented here, turns the theta join into an
  * equi-join: explode each interval into the fixed-width buckets it
  * overlaps, bucket each point once, hash-join on the bucket id, and
  * re-check the exact predicate. Each matching (point, interval) pair
  * meets in EXACTLY one bucket — the point's — so no dedup pass is
  * needed.
  *
  * Cost model: interval rows multiply by ceil(span/bucketWidth); points
  * stay 1:1. Pick `bucketWidth` near the TYPICAL interval span so the
  * explode factor stays O(1) and buckets stay selective — the knob is
  * data-dependent by nature, which is exactly why Spark cannot plan
  * this generically and the operator must exist.
  *
  * Keys are integral (e.g. epoch micros — `unix_micros` both here and
  * `epoch_us` in the oracle). Non-negative domain assumed (`div`
  * truncation = floor there); all columns of both inputs pass through,
  * so callers keep their own names collision-free.
  */
object RangeJoin {

  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, startCol: String, endCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_bkt", explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"(`$endCol` - 1) div $bucketWidth"))))
    val pt = points.withColumn("_bkt", expr(s"`$pointCol` div $bucketWidth"))
    pt.join(iv, Seq("_bkt"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bkt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — the data-layout half of scan
  * performance at 100 TB: interleave the bits of two filter columns and
  * range-partition + sort on the interleaved value, so every output
  * file covers a small RECTANGLE in (a, b) space instead of a thin
  * full-width stripe. Parquet min/max (and any lakehouse file-skipping
  * index) then prunes files for predicates on EITHER column — the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Beyond-
  * reference surface (SURVEY §2.13).
  *
  * The z-value itself is pure integer bit arithmetic (mask to `bits`,
  * interleave a into even and b into odd positions), replayed verbatim
  * by the oracle; the layout effect (per-partition bounding boxes
  * shrink vs single-column sorting) is pinned by a self-asserting
  * spec, since file statistics are engine-side state.
  *
  * Inputs are masked to their low `bits` bits — callers bucket or
  * hash-fold wider domains first (standard practice; documented rather
  * than hidden, because silently dropping high bits of a wide key
  * would interleave garbage).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits: a → even positions,
    * b → odd. bits ≤ 31 keeps the result in a positive long.
    */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Range-partition + sort the frame by the z-value of (aCol, bCol):
    * the write-side layout step (write the result with any sink and the
    * per-file min/max of BOTH columns tighten).
    */
  def layout(df: DataFrame, aCol: String, bCol: String, partitions: Int,
             bits: Int = 16): DataFrame =
    df.withColumn("_z", zValue2(col(aCol), col(bCol), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level Bloom skipping index — the data-skipping tier BETWEEN
  * partition pruning (directory level, [[graft.sinks.Sinks
  * .writePartitioned]]) and parquet min/max row-group stats
  * ([[ZOrder]] tightens those): point/IN-list lookups on a
  * high-cardinality key that is NOT the layout key. Min/max stats are
  * useless for a key scattered uniformly across files (every file's
  * range covers every probe); a per-file Bloom filter answers "can this
  * file contain key X" with no false negatives, so a point lookup on a
  * 100 TB corpus reads the handful of files that might hold the key
  * instead of all of them — the Delta/Iceberg bloom-filter-index shape,
  * built here as a plain DataFrame over the standard Spark sketch wire
  * format.
  *
  * Scale shape: the index has ONE ROW PER FILE (a 100 TB dataset at
  * 128 MB files is ~800k rows — driver-listable file names, never
  * data); the build is one distributed partial-agg pass grouped by
  * `_metadata.file_path` (filter bytes merge associatively, so partial
  * aggregation applies and the shuffle carries filters, not keys); the
  * probe evaluates distributed over the index and collects only the
  * MATCHED file-name strings. New files append new index rows — no
  * rebuild (filters are per-file, independent).
  *
  * Correctness contract: pruning is sound (Bloom filters have no false
  * negatives — a pruned scan NEVER misses a row the full scan finds),
  * and [[prunedScan]] re-applies the exact predicate so false
  * positives only cost IO, never wrong rows. The `s8_bloom_prune` gate
  * hash-compares the pruned scan against the oracle's full-scan
  * filter; BloomIndexSpec asserts the files-read reduction.
  */
object BloomIndex {

  /** Per-file index rows (file, n_rows, bloom) for `keyCol` (cast to
    * string — the one hash contract shared with every BloomOps probe).
    * `expectedPerFile` sizes each filter (~1.2 MB per million keys at
    * fpp 0.01).
    */
  def build(data: DataFrame, keyCol: String, expectedPerFile: Long,
            fpp: Double = 0.01): DataFrame =
    data
      .select(col("_metadata.file_path").as("file"),
        col(keyCol).cast("string").as("_k"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.BloomOps.bloomAgg(col("_k"), expectedPerFile, fpp)
          .as("bloom"))

  /** Files that might contain ANY of `values` — the sound overset of
    * the files a point/IN-list scan must read. Distributed probe over
    * the index; only matched file-name strings reach the driver.
    */
  def candidateFiles(index: DataFrame, values: Seq[String]): Seq[String] = {
    require(values.nonEmpty, "candidateFiles needs at least one probe value")
    val hit = values
      .map(v => graft.functions.BloomOps.bytesMightContain(col("bloom"), lit(v)))
      .reduce(_ || _)
    index.where(hit).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Point/IN-list scan through the index: read only candidate files,
    * then re-apply the exact predicate (false positives filtered —
    * identical rows to the full scan, just less IO). Empty candidate
    * set short-circuits to an empty frame with the data schema (footer
    * read only).
    */
  def prunedScan(spark: SparkSession, dataPath: String, index: DataFrame,
                 keyCol: String, values: Seq[String]): DataFrame = {
    val files = candidateFiles(index, values)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(dataPath).schema)
      else spark.read.parquet(files: _*)
    base.where(col(keyCol).cast("string").isin(values: _*))
  }
}

package graft.sinks

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

/** Output writers (SURVEY §2.2 K1–K5) — the reference's Writers
  * (/root/reference .. utils/Writers.scala:8-52).
  */
object Sinks {
  private val log = LoggerFactory.getLogger(getClass)

  /** K1–K3 + K5: final (Monte-Carlo) results. csv gathers to a single
    * gzip file via coalesce(1) — the reference documents this as slow by
    * contract (reference.conf:21-22); json/parquet stay partitioned.
    * Unknown formats log and skip, no throw (K5) — config validation
    * happens upstream.
    *
    * Delta vs reference: each format lands in its own subdirectory
    * (`$outputPath/<format>`) — the reference writes every configured
    * format to the same path, which collides as soon as two formats are
    * configured.
    */
  def writeResults(results: DataFrame, outputPath: String, format: String): Unit =
    format match {
      case "csv" =>
        results.coalesce(1).write.mode("overwrite")
          .option("compression", "gzip")
          .option("header", "true")
          .csv(s"$outputPath/csv")
      case "json" | "jsonl" =>
        results.write.mode("overwrite").json(s"$outputPath/json")
      case "parquet" =>
        results.write.mode("overwrite").format("parquet").save(s"$outputPath/parquet")
      case other =>
        log.error(s"Unrecognised output format $other")
    }

  /** Beyond-reference scale sink: hive-style directory partitioning.
    * Queries filtering on the partition columns prune whole directories at
    * planning time (PartitionFilters on the scan) — at 100 TB the
    * difference between reading one partition and listing them all.
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Beyond-reference scale sink: bucketed managed table. Bucketing
    * co-locates the join/aggregation key at write time, so every later
    * equi-join or groupBy on `key` between same-bucket-count tables plans
    * with NO shuffle on either side — the write pays the partitioning
    * once, every downstream query reuses it. The bucket files are also
    * sorted by key, so sort-merge joins skip their sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** K4 + K5: the pre-Monte-Carlo aggregate, path suffix "Unfiltered";
    * csv intentionally unsupported here (falls to the error case), matching
    * the reference (Writers.scala:38-52).
    */
  def writeUnfiltered(results: DataFrame, outputPath: String, format: String): Unit =
    format match {
      case "json" | "jsonl" =>
        results.write.mode("overwrite").json(s"${outputPath}Unfiltered/json")
      case "parquet" =>
        results.write.mode("overwrite").format(format).save(s"${outputPath}Unfiltered/$format")
      case other =>
        log.error(s"Unrecognised output format $other")
    }

  /** Beyond-reference scale sink: Z-ordered parquet
    * ([[graft.operators.ZOrder.layout]] + write). Every output file
    * covers a near-square rectangle in (aCol, bCol) space, so parquet
    * footer min/max — and any lakehouse file-skipping index over them —
    * prunes files for predicates on EITHER column; a single-column sort
    * only ever prunes its own column. `files` bounds output file count
    * (one per range partition).
    */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
                    files: Int, bits: Int = 16): Unit =
    graft.operators.ZOrder.layout(df, aCol, bCol, files, bits)
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction — the daily-ingest hygiene pass: a
    * directory accreting one parquet file per micro-batch/trigger soon
    * has thousands of KB-sized files, and every later scan pays a task
    * per file. Rewrite the directory into ceil(totalBytes/targetBytes)
    * files (at least 1), sized from the ACTUAL on-disk footprint (file
    * listing, not a data scan). Round-robin repartition — compaction is
    * a layout fix; ordering/clustering belongs to [[writeZOrdered]].
    *
    * Writes to a temp sibling then swaps via rename, so a concurrent
    * reader sees either the old layout or the new, never a half-written
    * directory. Returns the output file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val dir = new java.io.File(path)
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    require(parts.nonEmpty, s"no parquet files under $path")
    val total = parts.map(_.length()).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(dir.getParentFile, dir.getName + "._compact_tmp")
    val bak = new java.io.File(dir.getParentFile, dir.getName + "._compact_old")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.getPath)
    if (bak.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(bak)
    }
    require(dir.renameTo(bak) && tmp.renameTo(dir),
      s"compaction swap failed for $path")
    log.info(s"compacted $path: ${parts.length} files ($total bytes) -> $n files")
    n
  }

  /** Manifest-commit protocol — the poor-man's ACID every lakehouse
    * table format is built around: a write becomes visible ONLY when the
    * `_manifest` file (the list of valid data files) is atomically
    * swapped in. A crashed or concurrent half-write leaves orphan part
    * files in the directory that [[readCommitted]] never sees, because
    * readers enumerate the MANIFEST, not the directory — the invariant
    * that makes retries idempotent and partial failures invisible at
    * 100 TB (a directory listing of a table mid-write is garbage; a
    * manifest is a snapshot).
    *
    * Each commit appends one `batch-<k>` directory and rewrites the
    * manifest as previous-files + new-files via write-temp-then-
    * ATOMIC_MOVE. Single-writer contract (like the reference's batch
    * jobs); multi-writer needs a lock service, documented not invented.
    * Returns the committed batch index.
    */
  def commitParquet(df: DataFrame, tableDir: String): Int = {
    val dir = new java.io.File(tableDir)
    dir.mkdirs()
    val manifest = new java.io.File(dir, "_manifest")
    val previous: Seq[String] =
      if (manifest.exists())
        new String(java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
          .split("\n").toSeq.filter(_.nonEmpty)
      else Seq.empty
    val k = Option(dir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("batch-"))
    val batchDir = new java.io.File(dir, s"batch-$k")
    df.write.mode("errorifexists").parquet(batchDir.getPath)
    val fresh = Option(batchDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => s"batch-$k/${f.getName}").sorted
    require(fresh.nonEmpty, s"commit wrote no part files under $batchDir")
    val tmp = new java.io.File(dir, s"._manifest_tmp_$k")
    java.nio.file.Files.write(tmp.toPath,
      (previous ++ fresh).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, manifest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    log.info(s"committed batch-$k (${fresh.length} files) to $tableDir")
    k
  }

  /** Read exactly the committed snapshot: the manifest's file list, never
    * the directory listing — orphans from crashed writes are invisible.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
                    tableDir: String): DataFrame = {
    val manifest = new java.io.File(tableDir, "_manifest")
    require(manifest.exists(), s"no _manifest under $tableDir — nothing committed")
    val files = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty)
      .map(rel => new java.io.File(tableDir, rel).getPath)
    spark.read.parquet(files: _*)
  }
}

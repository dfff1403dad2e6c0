package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver-generated synthetic tables
  * (TESTDATA.md). All queries take the sf directory at call time so the
  * same plan runs at any scale factor.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** SCAN FAN-OUT (round 8, guide §2.5/§6): each sf table is ONE parquet
    * file with one row group, so every scan stage is a SINGLE task —
    * all per-row work below the first exchange (regex normalization,
    * gram kernels, tokenization: the dominant cost of the text gates)
    * ran serially on a 32-core host. A deterministic hash repartition
    * on the first column spreads the scan to the session's shuffle
    * parallelism. Scale-adaptive, not local-tuned: it fires only when
    * the scan has FEWER partitions than both the shuffle parallelism
    * and the table's size-derived ceiling (≥16 KiB per partition, so
    * 5-row dimension tables stay put), i.e. on a real multi-file corpus
    * at scale the scan is already parallel and this is a no-op. Hash-on-
    * key (not round-robin) keeps row→partition deterministic under
    * task retry with no sort-before-repartition pass. Kill switch:
    * spark.graft.scan.fanout=false.
    */
  private def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val enabled = spark.conf.get("spark.graft.scan.fanout", "true").toBoolean
    if (!enabled) return df
    val target = spark.sessionState.conf.numShufflePartitions
    // partition estimate from file bytes (stats are the listed file
    // sizes) — building the scan RDD just to count partitions would pay
    // a planning pass per table reference
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val scanParts =
      (bytes / spark.sessionState.conf.filesMaxPartitionBytes).toInt + 1
    if (scanParts >= target) return df
    val ceil = (bytes / 16384).min(BigInt(target)).toInt
    // ROUND-ROBIN, not hash-on-key: a key column in the repartition
    // expression would defeat column pruning at the scan for every
    // consumer that never reads the key (retry-determinism is provided
    // by Spark's sort-before-repartition, on by default)
    if (ceil <= scanParts) df else df.repartition(ceil)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    fanOut(spark, spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's reader only
    * accepts as long (spark.sql.legacy.parquet.nanosAsLong=true — set in
    * the harness sessions); normalize to a µs TimestampType column here.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // copies written by an NTZ-inferring session (e.g. a cached
      // ScaleProbe multiple) read back as TIMESTAMP_NTZ, which
      // unix_micros rejects; sessions here run UTC, so the cast is
      // value-preserving and matches DuckDB's naive reading
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

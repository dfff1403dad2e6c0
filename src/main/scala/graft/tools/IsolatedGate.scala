package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM single-gate measurement — the worker side of Bench's
  * isolated tier. The 349-gate suite JVM inflates per-gate numbers ~3×
  * (code-cache and heap crowding, JIT deopt churn, accumulated
  * metaspace: x_chrf measured 11.5 s in-suite vs 4.0 s standalone in
  * round 6), so every cross-round comparison through the suite numbers
  * was comparing crowding, not plans. This main runs ONE gate in its
  * own JVM with the exact Bench methodology (same session conf,
  * toRdd materialization, cache cleared per sample, one untimed
  * warm-up run so the measurement excludes first-plan codegen/JIT),
  * and prints a single ISOLATED-prefixed JSON line the parent parses.
  *
  * Usage: IsolatedGate <gate> <sfDir> <cpus> [runs]
  */
object IsolatedGate {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val sfDir = args(1)
    val cpus = args(2)
    val runs = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(gate)
    // warm-up: the gate's own plan, untimed — JIT + codegen compile once
    q(spark, sfDir).queryExecution.toRdd.count()
    val samples = (1 to runs).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = samples(samples.size / 2)
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // stdout may carry stray Spark noise: the ISOLATED prefix is the
    // parse anchor, and this is the LAST line printed
    println(s"""ISOLATED{"gate":"$gate","median":${num(med)},"best":${num(samples.head)},"runs":$runs}""")
    spark.stop()
  }
}

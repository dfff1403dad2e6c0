package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: exercise scan/agg/join codegen + JIT once so the
    // first measured query doesn't absorb several seconds of compilation
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Methodology (declared in the JSON):
    //  - toRdd.count() materializes every output column — a plain count()
    //    lets Catalyst prune projection-only work, under-measuring
    //    scan/project queries vs what Verify actually writes.
    //  - best of 2 runs amortizes per-query codegen compilation, as a
    //    100 TB input would (compile once, scan for minutes).
    //  - the cache is cleared before every run: 48 queries' accumulated
    //    cached frames otherwise pile up storage pressure so late queries
    //    measure eviction+recompute, not the operator; clearing also makes
    //    run 2 re-do its own IO instead of timing a cache hit.
    val runs = 2
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results: Map[String, Option[Double]] = SparkEntry.queries.map {
      case (name, fn) =>
        val times = (1 to runs).flatMap { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).queryExecution.toRdd.count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case _: Throwable =>
              if (!failed.contains(name)) failed += name
              None
          }
        }
        name -> times.minOption
    }
    // a throwing query reads as null + a "failed" entry, never as a fast
    // time, and contributes nothing to the total
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val total = results.values.flatten.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"timing":"best-of-runs, toRdd materialization, cache cleared per run","failed":$failedJson}""")
    spark.stop()
  }
}

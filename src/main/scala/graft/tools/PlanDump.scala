package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` for named gates to files — the plan
  * evidence the optimization rounds commit under `plans/r{N}/`.
  *
  * Usage: PlanDump <outDir> <suffix> <gate> [gate ...]
  *   writes <outDir>/<gate>_<suffix>.txt per gate.
  *
  * Session conf matches Bench/IsolatedGate so the dumped plan is the
  * plan the bench actually times (same extensions, same shuffle
  * partitions, same parquet flags).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val gates = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (g <- gates) {
      try {
        val df = graft.SparkEntry.queries(g)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${g}_$suffix.txt"), txt)
        println(s"[plandump] wrote $outDir/${g}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $g FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

object DebugMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // --plain builds the session WITHOUT GraftExtensions — the A/B for
    // "did an injected rule change this gate's plan/time" questions
    // (AbBench's conf kill-switches can't remove the injection itself)
    val plain = args.contains("--plain")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    implicit val spark: SparkSession =
      (if (plain) b else b.withExtensions(new graft.session.GraftExtensions))
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // usage: [--time] [--plain] [--dir sfdir] query...   (default: print physical plan)
    val time = args.contains("--time")
    val dir = args.sliding(2).collectFirst { case Array("--dir", d) => d }
      .getOrElse("/root/testdata/sf0.01")
    val qs = args.filterNot(_.startsWith("--")).filterNot(_ == dir)
    for (q <- qs) {
      println(s"===== $q =====")
      if (time) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      } else
        println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
          .toString.take(3500))
    }
    spark.stop()
  }
}

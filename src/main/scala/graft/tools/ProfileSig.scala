package graft.tools

import graft._
import graft.operators.{Contingency, Meddra, MonteCarlo}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the significant_pairs query at sf0.1 under the
  * bench's cold-cache methodology (cache cleared between repetitions, JIT
  * warm after round 1) — the kernel micro-benchmark (ProfileMc) shows the
  * MC UDF itself is ~0.6 s single-threaded, so any excess lives in the
  * plan.
  */
object ProfileSig {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"round $round")
      spark.catalog.clearCache()
      val li = Tables.lineitem(spark, dir)
      val sup = Tables.supplier(spark, dir)
      val part = Tables.part(spark, dir)
      val ev = li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .select(col("l_orderkey").as("safetyreportid"),
          col("s_name").as("chembl_id"),
          col("p_brand").as("reaction_reactionmeddrapt")).cache()
      t("events cache")(ev.count())
      val pairs = Meddra.withEmptyCode(Contingency.pairStatistics(ev, exact = true)).cache()
      t("pairs cache")(pairs.count())
      val crit = MonteCarlo.criticalValues(pairs, 0.95, 50, Some(42L))
      t("crit")(crit.count())
      t("join")(pairs.join(crit, Seq("chembl_id"), "inner").count())
      spark.catalog.clearCache()
      t("one-shot (bench shape)")(
        SparkEntry.queries("significant_pairs")(spark, dir)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}

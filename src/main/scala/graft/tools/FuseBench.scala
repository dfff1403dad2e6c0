package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state A/B for [[graft.plans.FuseMd5Uniform]]: the same
  * portable-uniform expression over the same materialized frame, with
  * the rule active vs excluded (spark.sql.optimizer.excludedRules) in
  * ONE JVM — same JIT state, same input, median of 3 after warm-up.
  */
object FuseBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(n)
      .select(concat(lit("k:"), col("id").cast("string")).as("s"))
      .localCheckpoint()
    val u = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")

    def median3(f: => Long): (Double, Long) = {
      f // warm
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val v = f
        ((System.nanoTime() - t0) / 1e9, v)
      }
      (rs.map(_._1).sorted.apply(1), rs.head._2)
    }

    // modular sum: Σ of raw 60-bit draws overflows long at ~16 rows
    def run() = df.select(sum(pmod(u, lit(1000000007L)))).head().getLong(0)

    val (fused, v1) = median3(run())
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.FuseMd5Uniform")
    val (composed, v2) = median3(run())
    require(v1 == v2, s"fused/composed disagree: $v1 vs $v2")
    println(f"rows=$n fused=$fused%.2f s composed=$composed%.2f s " +
      f"speedup=${composed / fused}%.2fx (sums equal: $v1)")
    spark.conf.unset("spark.sql.optimizer.excludedRules")

    // ---- FuseShingleDistinct A/B: repetitive document-sized texts,
    // where array_distinct's pairwise walk is quadratic in shingles
    val nDocs = 100000L
    val words = (0 until 20).map(i => s"w$i")
    val text = (0 until 400).map(i => words(i % words.size)).mkString(" ")
    val docs = spark.range(nDocs)
      .select(concat(lit(text), lit(" t"), col("id").cast("string"))
        .as("text"))
      .localCheckpoint()
    val sh = graft.functions.NGramShingles
      .shingles(col("text"), 3, distinct = false)
    def runSh() =
      docs.select(sum(size(array_distinct(sh)))).head().getLong(0)
    val (shFused, s1) = median3(runSh())
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.FuseShingleDistinct")
    val (shComposed, s2) = median3(runSh())
    require(s1 == s2, s"shingle fused/composed disagree: $s1 vs $s2")
    println(f"docs=$nDocs shingle fused=$shFused%.2f s " +
      f"composed=$shComposed%.2f s " +
      f"speedup=${shComposed / shFused}%.2fx (sums equal: $s1)")
    spark.stop()
  }
}

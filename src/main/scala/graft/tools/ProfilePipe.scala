package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DataPipeline, QualityFilter, TextAnalysis}

/** Stage-grain profiler for the composed pipeline (pipe_full is the
  * bench's most expensive isolated gate): prepareStaged(materialize =
  * true) pins every boundary with an eager localCheckpoint, so the
  * WALL TIME BETWEEN BOUNDARIES is that stage's own compute — print it
  * per stage to see where the 15 s actually goes before optimizing
  * anything. Usage: ProfilePipe [sfDir]
  */
object ProfilePipe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // surface DataPipeline's per-stage INFO timings through the ERROR root
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.operators.DataPipeline", org.apache.logging.log4j.Level.INFO)

    val raw = Tables.documents(spark, dir)
    val d = raw.select("doc_id", "text")
    val kt = TextAnalysis.kernelTokens(col("text"))
    val corpus = d
      .unionByName(d.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      .unionByName(d.select((col("doc_id") + lit(2000000L)).as("doc_id"),
        concat(coalesce(col("text"), lit("")), lit(" zzqx")).as("text")))
      .unionByName(d.where(col("doc_id") % 10 === 3)
        .select(col("doc_id"), kt.as("toks"))
        .where(size(col("toks")) >= 30)
        .select((col("doc_id") + lit(3000000L)).as("doc_id"),
          concat(array_join(slice(col("toks"), 1, 24), " "),
            lit(" uniqmark"), col("doc_id").cast("string")).as("text")))
    val bench = d.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        array_join(slice(TextAnalysis.tokens(
          TextAnalysis.normalized(col("text"))), 1, 12), " ").as("text"))
    val cfg = DataPipeline.Config(
      quality = QualityFilter.Rules(
        minTokens = 25, maxTokens = 90,
        minMeanTokenLen = 3.8, maxMeanTokenLen = 5.1,
        minStopwordFrac = 0.02,
        maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.05),
      spanK = 8, nearDupThreshold = 0.8,
      contaminationThreshold = 0.99, contaminationMaxDf = 0L,
      chunkTokens = 64, chunkOverlap = 16,
      boilerplateSep = " table ", boilerplateMinDocs = 20L,
      classifierMargin = 0.0, classifierBuckets = 1024,
      tokenBudget = 3000L, budgetSeed = 7L,
      scheme = graft.operators.HashScheme.Portable)

    for (round <- 1 to 2) { // round 1 = cold (JIT/codegen), round 2 = warm
      var last = System.nanoTime()
      val stages = DataPipeline.prepareStaged(corpus, Some(bench), cfg,
        seeds = Some((raw.where(col("lang") === "en"),
          raw.where(col("lang") =!= "en"))),
        budgetGroups = Some(raw.select(col("doc_id"), col("lang").as("grp"))),
        materialize = true)
      // materialize=true checkpoints each boundary EAGERLY as the Seq is
      // built, so by the time prepareStaged returns, all compute is done
      // — time it stage by stage instead via per-stage counts on LAZY
      // construction? No: the eager pins mean the build call itself is
      // where time goes. Measure it wholesale, then per-stage counts
      // (cheap — pinned frames).
      val built = System.nanoTime()
      println(f"[$round] prepareStaged(materialize) total: ${(built - last) / 1e9}%.2f s" +
        " (per-stage split logged above by DataPipeline)")
      last = built
      for ((name, df) <- stages) {
        val n = df.count()
        val t = System.nanoTime()
        println(f"[$round]   $name%-16s count=$n%-7d recount +${(t - last) / 1e9}%.2f s")
        last = t
      }
    }
    spark.stop()
  }
}

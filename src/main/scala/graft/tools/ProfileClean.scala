package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Boilerplate, Classifier, QualityFilter, TextAnalysis}

/** Sub-stage profiler for the pipeline's `cleaned` head (the dominant
  * pipe_full cost): times each component chain on the pipe_full corpus
  * shape with the noop-materialization methodology. Also prints the
  * QualityFilter predicate's plan so duplicated stripMarkup subtrees
  * are visible. Usage: ProfileClean [sfDir]
  */
object ProfileClean {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    val rules = QualityFilter.Rules(
      minTokens = 25, maxTokens = 90,
      minMeanTokenLen = 3.8, maxMeanTokenLen = 5.1,
      minStopwordFrac = 0.02,
      maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.05)

    def time(name: String, df: DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        println(f"[$i] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    time("corpus scan", corpus)
    val stripped = corpus.withColumn("text", TextAnalysis.stripMarkup(col("text")))
    time("stripMarkup", stripped)
    time("qualityFilter(stripped)", QualityFilter(stripped, rules))
    time("qualityFilter(raw)", QualityFilter(corpus, rules))
    val qf = QualityFilter(stripped, rules)
    val bp = Boilerplate.removeBoilerplate(qf, " table ", 20L)
      .select(col("doc_id"), col("clean_text").as("text"))
      .where(length(col("text")) > 0)
    time("`+boilerplate`", bp)
    val cls = Classifier.filterByClassifier(bp,
      raw.where(col("lang") === "en"), raw.where(col("lang") =!= "en"),
      0.0, 1024)
    time("`+classifier` (full head)", cls)

    // how many stripMarkup regex chains does the filter predicate carry?
    val plan = QualityFilter(stripped, rules).queryExecution.executedPlan.toString
    val nStrip = "(?is)<script".r.findAllIn(plan).length
    println(s"stripMarkup copies in qualityFilter(stripped) physical plan: $nStrip")
    spark.stop()
  }
}

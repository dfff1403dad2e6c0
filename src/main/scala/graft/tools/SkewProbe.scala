package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew probe (round-3 verdict #6): demonstrate that the two join shapes
  * with a structural skew hazard keep task times bounded on engineered
  * worst-case inputs.
  *
  *  - SEMANTIC self-join, one giant cluster (95% of vectors in one
  *    cluster_id): no cap exists or should — AQE skew-split divides the
  *    hot partition. The probe runs the same join with skew-join off vs
  *    on and reports max task duration + whether `skew=true` appears in
  *    the final plan.
  *  - DECONTAMINATE inverted-index join, one ubiquitous shingle (present
  *    in EVERY train doc): the structural answer is the maxDf stop-shingle
  *    cap (default ON) which removes the hot key BEFORE the join; the
  *    probe shows the capped run never builds the quadratic fan-out the
  *    uncapped run pays.
  *
  * Usage: SkewProbe [nDocs] — defaults 40000 vectors / 20000 docs.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      // force the sort-merge path (the 100 TB shape — neither side of a
      // corpus self-join broadcasts) and test-scale skew thresholds
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // -- task-duration listener: max/median task time of the last job set
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        durations.add(t.taskInfo.duration)
    })
    def measure(label: String)(body: => Long): Unit = {
      durations.clear()
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a moment
      Thread.sleep(500)
      val ds = durations.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      val maxS = if (ds.isEmpty) 0.0 else ds.last / 1e3
      val medS = if (ds.isEmpty) 0.0 else ds(ds.length / 2) / 1e3
      println(f"$label%-34s wall $wall%6.2f s  rows $rows%9d  " +
        f"task max $maxS%6.2f s med $medS%5.2f s  (${ds.length} tasks)")
    }

    // -- semantic: 95% of vectors in cluster 0
    val dim = 16
    val vecs = spark.range(0, n).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), i =>
          when(i === 0 && col("vec_id") % 20 =!= 0, 1.0d)
            .when(i === 1 && col("vec_id") % 20 === 0, 1.0d)
            .otherwise(sin(col("vec_id") * 31 + i) * 0.3d)))
      .cache()
    vecs.count()
    val centroids = Array.tabulate(4, dim)((c, i) => if (i == c) 1.0 else 0.0)
    def semantic(skewOn: Boolean): Long = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val pairs = graft.operators.Clustering
        .semanticPrunePairs(vecs, centroids, tau = 0.999)
      // toRdd on THIS QueryExecution: materializes every row AND leaves
      // the finalized adaptive plan readable on the same frame
      val cnt = pairs.queryExecution.toRdd.count()
      val s = pairs.queryExecution.executedPlan.toString
      println(s"  skew=true in final plan: ${s.contains("skew=true")}")
      cnt
    }
    measure("semantic giant-cluster, skew OFF")(semantic(false))
    measure("semantic giant-cluster, skew ON")(semantic(true))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // -- decontaminate: one shingle in EVERY train doc ("terms of service
    // apply" suffix), test docs all contain it too
    val nd = n / 2
    val train = spark.range(0, nd).toDF("doc_id")
      .withColumn("text", concat(
        lit("unique train words "),
        col("doc_id").cast("string"), lit(" alpha "),
        col("doc_id").cast("string"), lit(" beta "),
        lit("terms of service apply")))
      .cache()
    train.count()
    val test = spark.range(1000000, 1000500).toDF("doc_id")
      .withColumn("text", concat(
        lit("eval question "), col("doc_id").cast("string"),
        lit(" terms of service apply")))
    def decon(maxDf: Long): Long =
      graft.operators.Decontaminate
        .report(test, train, threshold = 0.5, maxDf = maxDf).count()
    measure(s"decontaminate hot shingle, capped")(decon(1000L))
    measure(s"decontaminate hot shingle, UNCAPPED")(decon(0L))

    // -- BM25: one term ("the") in EVERY doc, queries all contain it.
    // Same structural hazard as the decontaminate shingle: the postings
    // join fans the ubiquitous term out to |queries|x|corpus| rows for
    // ~zero idf contribution; maxDfFrac drops its postings BEFORE the
    // join (default 0.5) — the cap, not AQE, is the answer.
    val bdocs = spark.range(0, nd).toDF("doc_id")
      .withColumn("text", concat(
        lit("the common filler "),
        col("doc_id").cast("string"), lit(" alpha"),
        (col("doc_id") % 97).cast("string"), lit(" beta"),
        (col("doc_id") % 31).cast("string")))
      .cache()
    bdocs.count()
    val bq = bdocs.where(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("query_id"),
        concat(lit("the alpha"), (col("doc_id") % 97).cast("string"))
          .as("text"))
    def bm25(frac: Double): Long =
      graft.operators.Retrieval.bm25TopK(bdocs, bq, k = 10, maxDfFrac = frac)
        .queryExecution.toRdd.count()
    measure("bm25 hot term, capped (0.5)")(bm25(0.5))
    measure("bm25 hot term, UNCAPPED")(bm25(1.0))
    spark.stop()
  }
}

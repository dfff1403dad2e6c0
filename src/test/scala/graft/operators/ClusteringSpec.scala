package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ClusteringSpec extends SparkSpec {

  private def vecsDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }),
      schema)
  }

  // three well-separated anchors in 4-d
  private val anchors = Seq(
    Array(10.0, 0.0, 0.0, 0.0),
    Array(0.0, 10.0, 0.0, 0.0),
    Array(0.0, 0.0, 10.0, 0.0))

  private def planted: DataFrame = {
    val rows = for {
      (a, g) <- anchors.zipWithIndex
      j <- 0 until 20
    } yield {
      val noise = a.indices.map(i => math.sin(g * 31 + j * 17 + i) * 0.3)
      ((g * 100 + j).toLong, a.indices.map(i => (a(i) + noise(i)).toFloat))
    }
    vecsDf(rows)
  }

  test("assign: nearest centroid wins, ties break to lowest index") {
    val df = vecsDf(Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))))
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val got = Clustering.assign(df, cents).select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1))
    // equidistant point → first (lowest) centroid index
    val tie = Clustering.assign(vecsDf(Seq((9L, Seq(.5f, .5f, 0f, 0f)))), cents)
      .select("cluster_id").head().getInt(0)
    assert(tie === 0)
  }

  test("kmeans recovers planted clusters with full purity") {
    val res = Clustering.kmeans(planted, k = 3, maxIter = 10, seed = 11L)
    assert(res.centroids.length === 3)
    val assigned = Clustering.assign(planted, res.centroids)
      .withColumn("group_id", (col("vec_id") / 100).cast("int"))
    val purity = assigned.groupBy("group_id", "cluster_id").count()
      .groupBy("group_id").agg(max("count").as("m"))
      .agg(sum("m")).head().getLong(0)
    assert(purity === 60L, "every planted member lands with its anchor")
    // groups map to three DISTINCT clusters
    val distinctClusters = assigned.select("cluster_id").distinct().count()
    assert(distinctClusters === 3L)
  }

  test("kmeans converges on separated data and is seed-deterministic") {
    val a = Clustering.kmeans(planted, k = 3, maxIter = 25, seed = 5L)
    val b = Clustering.kmeans(planted, k = 3, maxIter = 25, seed = 5L)
    assert(a.converged, "well-separated planted clusters must converge")
    assert(a.iterations < 25)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
  }

  test("kmeans with k larger than distinct points keeps empty clusters in place") {
    val df = vecsDf(Seq((0L, Seq(1f, 1f, 1f, 1f)), (1L, Seq(1f, 1f, 1f, 1f))))
    val res = Clustering.kmeans(df, k = 2, maxIter = 5, seed = 3L)
    // both rows identical → one live cluster; no NaN centroids
    assert(res.centroids.forall(_.forall(d => !d.isNaN)))
  }

  test("kmeansCold: md5-ladder seeding is deterministic and matches a manual replay") {
    val df = planted
    val out = Clustering.kmeansCold(df, k = 3, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    // deterministic: a second invocation is identical
    val again = Clustering.kmeansCold(df, k = 3, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(out === again)
    assert(out.map(_._1).distinct === Seq(1, 2))
    assert(out.map(_._2).distinct.sorted === Seq(0, 1, 2))
    // seed order replays the ladder: cluster 0's round-1 census must
    // come from seeding at the vec with the smallest md5("seed:"||id)
    val ladder = df.select(col("vec_id").cast("string").as("id"))
      .withColumn("h", md5(concat(lit("seed:"), col("id"))))
      .orderBy("h", "id").limit(3).collect().map(_.getString(0))
    val manualSeed = df.where(col("vec_id") === ladder.head.toLong)
      .select("embedding").head().getSeq[Float](0)
      .map(x => Clustering.roundHalfAway(x.toDouble * 1e6).toDouble / 1e6)
      .toArray
    // round-1 assignment from the manual seeds = kmeansCold's round 1
    val seeds = ladder.map(id =>
      df.where(col("vec_id") === id.toLong).select("embedding").head()
        .getSeq[Float](0)
        .map(x => Clustering.roundHalfAway(x.toDouble * 1e6).toDouble / 1e6)
        .toArray)
    assert(seeds.head.toSeq === manualSeed.toSeq)
    val manualR1 = Clustering.refineCentroids(df, seeds, rounds = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(out.filter(_._1 == 1) === manualR1)
  }

  test("semanticPrunePairs only pairs within a cluster and above tau") {
    // two clusters; in cluster 0 two near-identical docs + one far one
    val df = vecsDf(Seq(
      (0L, Seq(10f, 0f, 0f, 0f)),
      (1L, Seq(10f, 0.1f, 0f, 0f)),   // ≈ cosine 1 with doc 0
      (2L, Seq(6f, 0f, 4f, 0f)),      // same cluster, lower cosine
      (3L, Seq(0f, 10f, 0f, 0f))))    // other cluster
    val cents = Array(Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0))
    val pairs = Clustering.semanticPrunePairs(df, cents, tau = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((0L, 1L)))
  }

  test("semanticDedupClusters: transitive closure keeps one doc per ≥tau component") {
    // chain 1~2, 2~3 but 1≁3 (tau between cos(1,3) and the others):
    // one-pass policy drops 2 AND 3; closure also drops both (reachable
    // from 1) — and on a doc whose only neighbor is HIGHER-id (3~5 below)
    // the two policies differ: closure prunes it, one-pass keeps it.
    val df = vecsDf(Seq(
      (1L, Seq(10f, 0f, 0f, 0f)),
      (2L, Seq(9f, 4.3f, 0f, 0f)),    // ~0.90 vs 1
      (3L, Seq(6f, 7.9f, 0f, 0f)),    // ~0.90 vs 2, ~0.6 vs 1
      (9L, Seq(0f, 0f, 10f, 0f))))    // other cluster, untouched
    val cents = Array(Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 10.0, 0.0))
    val onePass = Clustering.semanticDedup(df, cents, tau = 0.85)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val closed = Clustering.semanticDedupClusters(df, cents, tau = 0.85)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(onePass == Set(1L, 9L))
    assert(closed == Set(1L, 9L), "chain 1-2-3 is one component, min=1 survives")
    // policy-divergence shape: 3's only ≥tau neighbor is 5 (higher id)
    val df2 = vecsDf(Seq(
      (1L, Seq(10f, 0f, 0f, 0f)),
      (5L, Seq(9f, 4.3f, 0f, 0f)),    // ~0.90 vs 1 and vs 3
      (3L, Seq(6f, 7.9f, 0f, 0f))))   // ~0.90 vs 5, ~0.6 vs 1
    val cents2 = Array(Array(10.0, 0.0, 0.0, 0.0))
    val onePass2 = Clustering.semanticDedup(df2, cents2, tau = 0.85)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val closed2 = Clustering.semanticDedupClusters(df2, cents2, tau = 0.85)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(onePass2 == Set(1L, 3L), "one-pass: 3 has no LOWER-id neighbor, kept")
    assert(closed2 == Set(1L), "closure: 3 reachable from 1 via 5, pruned")
  }

  test("semanticDedup keeps the lowest id of a duplicate group") {
    val df = vecsDf(Seq(
      (5L, Seq(10f, 0f, 0f, 0f)),
      (7L, Seq(10f, 0.01f, 0f, 0f)),
      (9L, Seq(0f, 10f, 0f, 0f))))
    val cents = Array(Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0))
    val kept = Clustering.semanticDedup(df, cents, tau = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(5L, 9L))
  }

  test("nearest centroid: separable planted classes classify perfectly") {
    import org.apache.spark.sql.functions.col
    // class c lives at axis c·10 with small per-point jitter
    val train = for (c <- 0 to 2; j <- 0 to 4) yield
      (c * 100L + j, Seq.tabulate(4)(i =>
        (if (i == c) 10f else 0f) + 0.01f * j), c)
    val test0 = for (c <- 0 to 2) yield
      (900L + c, Seq.tabulate(4)(i => if (i == c) 9.5f else 0.2f))
    val tr = spark.createDataFrame(
      spark.sparkContext.parallelize(train.map { case (id, v, l) => Row(id, v, l) }),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false)),
        StructField("label", IntegerType, nullable = false))))
    val cents = Clustering.labelCentroids(tr)
    assert(cents.map(_._1) == Seq(0, 1, 2))
    val pred = Clustering.nearestCentroid(vecsDf(test0), cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pred == Map(900L -> 0, 901L -> 1, 902L -> 2))
    // ties break to the lowest label: the origin is equidistant to all
    val tie = Clustering.nearestCentroid(
      vecsDf(Seq((999L, Seq(0f, 0f, 0f, 0f)))), cents)
      .head().getInt(1)
    assert(tie == 0)
    assert(pred.values.toSet == Set(0, 1, 2))
    val _ = col("vec_id") // keep the import used
  }

  test("silhouette: tight separated clusters near 1, boundary points near 0") {
    val cents = Array(Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0))
    val tight = vecsDf(Seq(
      (1L, Seq(10f, 0f, 0f, 0f)), (2L, Seq(9.9f, 0f, 0f, 0f)),
      (3L, Seq(0f, 10f, 0f, 0f)), (4L, Seq(0f, 9.9f, 0f, 0f))))
    val s1 = Clustering.silhouette(tight, cents)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(s1.values.forall(_ > 0.9), s"expected tight clusters: $s1")
    // midpoint between the two centroids scores ~0
    val mid = vecsDf(Seq((9L, Seq(5f, 5f, 0f, 0f))))
    val s0 = Clustering.silhouette(mid, cents).head().getDouble(2)
    assert(math.abs(s0) < 1e-6)
  }
}

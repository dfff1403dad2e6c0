package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 4 seed vectors of dim 8 → m=2 subspaces of width 4, ksub=4
  private val seeds: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0, 0.0, 5.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 5.0, 0.0),
    Array(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 5.0))

  private def corpusOf(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  private val seedCorpus = corpusOf(
    seeds.zipWithIndex.map { case (s, i) => (i.toLong, s.map(_.toFloat)) }: _*)

  test("seedModel slices seeds into per-subspace codebooks") {
    val m = ProductQuantizer.seedModel(seeds, m = 2)
    assert(m.dsub == 4 && m.ksub == 4 && m.dim == 8)
    assert(m.codebooks(0)(1).toSeq == Seq(0.0, 1.0, 0.0, 0.0))
    assert(m.codebooks(1)(2).toSeq == Seq(0.0, 0.0, 5.0, 0.0))
  }

  test("a seed vector encodes to its own code in every subspace") {
    // ||e||^2 - 2c·e >= -||c||^2 with equality iff e = c, so the argmin
    // of the shared kernel at a centroid is that centroid
    val model = ProductQuantizer.seedModel(seeds, m = 2)
    val codes = ProductQuantizer.encode(seedCorpus, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for (i <- seeds.indices)
      assert(codes(i.toLong) == Seq(i, i),
        s"seed $i must self-encode, got ${codes(i.toLong)}")
  }

  test("adcTopK ranks an exact duplicate first and excludes self") {
    val model = ProductQuantizer.seedModel(seeds, m = 2)
    val corpus = seedCorpus.unionByName(corpusOf(
      (100L, seeds(1).map(_.toFloat)), // duplicate of seed 1
      (101L, Array(9f, 9f, 9f, 9f, 9f, 9f, 9f, 9f))))
    val out = ProductQuantizer.adcTopK(corpus,
      seedCorpus.where($"vec_id" === 1L), model, k = 3).orderBy("rank").collect()
    assert(out.forall(_.getLong(1) != 1L), "self must be excluded")
    assert(out.head.getLong(1) == 100L,
      s"the exact duplicate must rank first: ${out.toSeq}")
    assert(out.map(_.getInt(4)).toSeq == (1 to 3))
  }

  test("ivfPqTopK with all lists probed equals exhaustive adcTopK") {
    val corpus = corpusOf((1L to 30L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 2.0 + d).toFloat))): _*)
    val model = ProductQuantizer.seedModel(seeds, m = 2)
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0))
    val q = corpus.where($"vec_id" <= 2L)
    val full = ProductQuantizer.adcTopK(corpus, q, model, k = 5)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val ivf = ProductQuantizer.ivfPqTopK(corpus, q, centroids, model,
      k = 5, nProbe = 2) // nProbe == nLists → identical candidate set
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(ivf == full, s"all-lists IVF-PQ must equal exhaustive ADC")
  }

  test("ivfPqTopK candidates stay inside probed lists") {
    val corpus = corpusOf((1L to 30L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 2.0 + d).toFloat))): _*)
    val model = ProductQuantizer.seedModel(seeds, m = 2)
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0))
    val q = corpus.where($"vec_id" === 1L)
    val out = ProductQuantizer.ivfPqTopK(corpus, q, centroids, model,
      k = 30, nProbe = 1)
    val allowed = corpus
      .select($"vec_id",
        Clustering.assignColumn($"embedding", centroids).as("l")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queryList = allowed(1L)
    val neighbors = out.select("neighbor_id").as[Long].collect()
    assert(neighbors.nonEmpty)
    assert(neighbors.forall(n => allowed(n) == queryList),
      "nProbe=1 results must come from the query's own list")
  }

  test("residualSeeds subtracts each seed's nearest centroid; zero for centroids themselves") {
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 5.0, 0.0, 0.0, 0.0))
    val rs = ProductQuantizer.residualSeeds(
      Array(centroids(0), Array(0.0, 1.0, 0.0, 0.0, 4.0, 0.0, 0.0, 0.0)),
      centroids)
    // a seed equal to a centroid has zero residual
    assert(rs(0).forall(_ == 0.0))
    // the second seed is nearer centroid 1 (distance² 2 vs 18) → v − c1
    assert(rs(1).toSeq == Seq(0.0, 1.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0))
  }

  test("encodeResidual: exact duplicate of a corpus vector gets its list and codes") {
    val corpus = corpusOf((1L to 30L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 2.0 + d).toFloat))): _*)
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0))
    val model = ProductQuantizer.seedModel(seeds, m = 2)
    val twin = corpus.where($"vec_id" === 7L)
      .select(lit(777L).as("vec_id"), $"embedding")
    val enc = ProductQuantizer.encodeResidual(
        corpus.unionByName(twin), centroids, model)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    assert(enc(777L) == enc(7L),
      "identical vectors must land in the same list with the same residual codes")
    assert(enc.values.forall { case (l, cs) =>
      l >= 0 && l < 2 && cs.length == 2 && cs.forall(c => c >= 0 && c < 4) })
  }

  test("ivfPqResidualTopK ranks an exact duplicate first; candidates honor probed lists") {
    val corpus = corpusOf((1L to 30L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 2.0 + d).toFloat))): _*)
    val centroids = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0))
    val model = ProductQuantizer.seedModel(seeds, m = 2)
    val twin = corpus.where($"vec_id" === 5L)
      .select(lit(555L).as("vec_id"), $"embedding")
    val all = corpus.unionByName(twin)
    val q = all.where($"vec_id" === 555L)
    val out = ProductQuantizer.ivfPqResidualTopK(all, q, centroids, model,
      k = 30, nProbe = 2).collect()
    // the twin shares the query's own argmin codes, so its ADC is the
    // achievable minimum (other vectors may TIE on the coarse ksub=4
    // codebook — rank order among ties is id-ascending, so assert on the
    // score, not the position)
    val byId = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byId(5L) == out.map(_.getLong(2)).min,
      "the twin's source must sit at the minimum ADC distance")
    assert(!byId.contains(555L), "self must be excluded")
    // nProbe = 1: neighbors restricted to the query's own coarse list
    val one = ProductQuantizer.ivfPqResidualTopK(all, q, centroids, model,
      k = 30, nProbe = 1)
    val lists = all
      .select($"vec_id", Clustering.assignColumn($"embedding", centroids).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = one.select("neighbor_id").as[Long].collect()
    assert(got.nonEmpty && got.forall(n => lists(n) == lists(555L)))
  }

  test("train fits per-subspace codebooks of the requested shape") {
    val corpus = corpusOf((1L to 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 2.0 + d).toFloat))): _*)
    val model = ProductQuantizer.train(corpus, m = 4, ksub = 2, maxIter = 3)
    assert(model.m == 4 && model.dsub == 2 && model.ksub == 2)
    assert(model.codebooks.forall(_.forall(_.length == 2)))
    // encoding under the trained model is total and in-range
    val codes = ProductQuantizer.encode(corpus, model).collect()
    assert(codes.length == 40)
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 2)))
  }
}

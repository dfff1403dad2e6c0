package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen: hand-checked 2x2, orthonormal vectors, descending values") {
    // [[2,1],[1,2]] → eigenvalues 3, 1 with vectors (1,1)/√2, (1,-1)/√2.
    // Tolerance 1e-9, not 1e-12: the state is pico-snapped per rotation
    // (the oracle-replay contract), so norms carry ~1e-12 grid error.
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-9 && math.abs(vals(1) - 1.0) < 1e-9)
    assert(math.abs(math.abs(dot(vecs(0), Array(1, 1).map(_ / math.sqrt(2)))) - 1.0) < 1e-9)
    assert(math.abs(dot(vecs(0), vecs(1))) < 1e-9)
    assert(math.abs(dot(vecs(0), vecs(0)) - 1.0) < 1e-9)
  }

  test("fit recovers a planted dominant direction") {
    // points = t·u + small deterministic noise, u = (3,0,4,0)/5
    val u = Array(0.6, 0.0, 0.8, 0.0)
    val rows = (0 until 200).map { i =>
      val t = (i % 21) - 10.0                      // spread along u
      val n1 = ((i * 7) % 5 - 2) * 0.01            // tiny noise off-axis
      val n2 = ((i * 11) % 5 - 2) * 0.01
      (i.toLong, Array(
        (t * u(0) + n1).toFloat, n1.toFloat,
        (t * u(2) + n2).toFloat, n2.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, k = 2)
    assert(math.abs(math.abs(dot(m.components(0), u)) - 1.0) < 1e-3,
      s"PC1 ${m.components(0).toSeq} not aligned with planted direction")
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1),
      s"planted variance must dominate: ${m.eigenvalues.toSeq}")
    // components orthonormal
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1.0) < 1e-9)
  }

  test("momentsMicro is exact: replayed against a driver-side computation") {
    val df = Seq(
      (1L, Array(0.25f, -0.5f)),
      (2L, Array(1.0f, 0.125f)),
      (3L, Array(-0.75f, 2.0f))).toDF("vec_id", "embedding")
    val got = Pca.momentsMicro(df).orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val micro = Seq(Seq(250000L, -500000L), Seq(1000000L, 125000L), Seq(-750000L, 2000000L))
    def s(i: Int) = micro.map(_(i)).sum
    def sp(i: Int, j: Int) = micro.map(v => v(i) * v(j)).sum
    assert(got.toSeq == Seq(
      (0, 0, 3L, s(0), s(0), sp(0, 0)),
      (0, 1, 3L, s(0), s(1), sp(0, 1)),
      (1, 1, 3L, s(1), s(1), sp(1, 1))))
  }

  test("exact=false decimal census ≡ long census cell for cell; fit accepts both") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val asLong = Pca.momentsMicro(embs).orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val asDec = Pca.momentsMicro(embs, exact = false).orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDecimal(3).longValueExact(), r.getDecimal(4).longValueExact(),
        r.getDecimal(5).longValueExact()))
    assert(asLong.toSeq == asDec.toSeq,
      "DECIMAL(38,0) census must be integer-identical to the BIGINT census")
    // and the fitted models agree (identical census → identical Jacobi input)
    val mL = Pca.fit(embs, k = 4)
    val mD = Pca.fit(embs, k = 4, exact = false)
    assert(mL.eigenvalues.toSeq == mD.eigenvalues.toSeq)
    assert(mL.components.map(_.toSeq).toSeq == mD.components.map(_.toSeq).toSeq)
    assert(mL.mean.toSeq == mD.mean.toSeq)
  }

  test("fit refuses ragged embeddings instead of silently skewing the covariance") {
    val ragged = Seq(
      (1L, Array(0.25f, -0.5f)),
      (2L, Array(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Pca.fit(ragged, k = 1))
    assert(e.getMessage.contains("ragged"))
  }

  test("project: PCA reconstruction beats coordinate truncation; whitening normalizes") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val k = 8
    val m = Pca.fit(embs, k)
    // captured variance (sum of top-k eigenvalues) must be >= the best
    // k coordinate variances — PCA is the optimal linear projection
    val d = m.dim
    val cov = Pca.momentsMicro(embs).collect()
    val n = cov.head.getLong(2).toDouble
    val coordVar = cov.filter(r => r.getInt(0) == r.getInt(1)).map { r =>
      (r.getLong(5) / n - math.pow(r.getLong(3) / n, 2)) / 1e12
    }.sorted.reverse.take(k).sum
    val captured = m.eigenvalues.sum
    assert(captured >= coordVar - 1e-9,
      s"top-$k PCs capture $captured < best-$k coords $coordVar")
    // whitened projection: each output dim has ~unit variance
    val proj = Pca.project(embs, m, whiten = true)
    val stats = proj.select(posexplode(col("projected")).as(Seq("c", "x")))
      .groupBy("c").agg(avg(col("x") * col("x")).as("m2"), avg("x").as("m1"))
      .collect().map(r => r.getDouble(1) - r.getDouble(2) * r.getDouble(2))
    assert(stats.length == k)
    stats.foreach(v => assert(math.abs(v - 1.0) < 0.05,
      s"whitened variance $v should be ~1"))
  }
}

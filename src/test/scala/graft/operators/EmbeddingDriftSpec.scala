package graft.operators

import graft.SparkSpec

class EmbeddingDriftSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(shift: Float) = (1L to 50L)
    .map(i => (i, Array(0.5f + shift, -0.25f, (i % 5) / 10.0f + shift)))
    .toDF("vec_id", "embedding")

  test("identical snapshots: cosine 1, zero shift") {
    val s = EmbeddingDrift.summary(vecs(0f), vecs(0f)).head()
    assert(s.getLong(0) === 3L)
    assert(s.getDouble(1) === 1.0)
    assert(s.getDouble(2) === 0.0)
  }

  test("a mean shift is localized to the shifted dims") {
    val per = EmbeddingDrift.perDim(vecs(0f), vecs(0.2f))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(per(0L) - 0.2) < 1e-4)
    assert(per(1L) === 0.0, "unshifted dim must read zero")
    assert(math.abs(per(2L) - 0.2) < 1e-4)
    val s = EmbeddingDrift.summary(vecs(0f), vecs(0.2f)).head()
    assert(s.getDouble(1) < 1.0, "centroid cosine must move off 1")
    assert(math.abs(s.getDouble(2) - 0.2) < 1e-4)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {

  import spark.implicits._

  // query 1 at the origin direction; docs 10,11 nearly parallel to it
  // (one cluster), doc 20 orthogonal-ish but still positive — plain
  // top-2 is {10, 11}; a diversity-aware pick swaps 11 for 20.
  private def emb = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (10L, Array(0.99f, 0.1f, 0f, 0f)),
    (11L, Array(0.98f, 0.12f, 0f, 0f)),
    (20L, Array(0.5f, 0f, 0.8f, 0f))
  ).toDF("vec_id", "embedding")

  private def run(lam: Long, k: Int = 3) =
    Mmr.diversifiedTopK(emb, emb.where(col("vec_id") === 1), pool = 3, k = k,
      lambdaMicro = lam)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))

  test("λ = 1 degenerates to pure relevance order") {
    val picks = run(1000000L).map(_._1)
    assert(picks.toSeq === Seq(10L, 11L, 20L))
  }

  test("λ = 0.5 diversifies: the near-duplicate drops below the outlier") {
    val picks = run(500000L).map(_._1)
    assert(picks.head === 10L, "first pick is always max relevance")
    assert(picks(1) === 20L,
      s"second pick must leave the tight cluster: ${picks.mkString(",")}")
    assert(picks(2) === 11L)
  }

  test("k rows per query, all distinct, ranks 1..k") {
    val out = Mmr.diversifiedTopK(emb, emb.where(col("vec_id") <= 10),
      pool = 3, k = 3, lambdaMicro = 700000L)
    val byQ = out.collect().groupBy(_.getLong(0))
    assert(byQ.keySet === Set(1L, 10L))
    for ((_, rows) <- byQ) {
      assert(rows.map(_.getLong(1)).distinct.length === 3)
      assert(rows.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("maxsim floor at 0: anti-similar docs earn no diversity bonus") {
    val e2 = Seq(
      (1L, Array(1f, 0f)), (10L, Array(0.9f, 0.1f)),
      (30L, Array(-0.5f, 0.86f))).toDF("vec_id", "embedding")
    val out = Mmr.diversifiedTopK(e2, e2.where(col("vec_id") === 1),
      pool = 2, k = 2, lambdaMicro = 500000L)
      .orderBy("mmr_rank").collect()
    // second-round score for 30 must be λ·rel (maxsim clamps at 0, not
    // the negative cosine vs pick 10)
    val r30 = out(1)
    assert(r30.getLong(1) === 30L)
    assert(r30.getLong(4) === 500000L * r30.getLong(3))
  }
}

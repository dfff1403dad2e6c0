package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeMiningSpec extends SparkSpec {
  import spark.implicits._

  // 1-d embeddings disguised as 2-d (second coord 0) make cosine = sign,
  // so craft vectors in 2-d with controlled angles instead: anchor along
  // x; candidates at increasing angles.
  private def vec(x: Double, y: Double) = Array(x.toFloat, y.toFloat)

  private val corpus = Seq(
    (0L, vec(1, 0)),      // anchor
    (1L, vec(0.9, 0.1)),  // positive (cos ~0.994)
    (2L, vec(0.8, 0.3)),  // nearest negative (cos ~0.936)
    (3L, vec(0.5, 0.5)),  // cos ~0.707
    (4L, vec(0, 1)),      // orthogonal
    (5L, vec(0.95, 0.05)) // cos ~0.9986 — ABOVE the positive: excluded
  ).toDF("vec_id", "embedding")

  private val pairs = Seq((0L, 1L)).toDF("anchor_id", "pos_id")

  test("semiHard excludes self, positive, and anything at/above pos cosine") {
    val out = NegativeMining.semiHard(corpus, pairs, k = 10)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(!out.contains(0L), "self excluded")
    assert(!out.contains(1L), "positive excluded")
    assert(!out.contains(5L), "harder-than-positive excluded (unlabeled positive)")
    assert(out(2L) == 1 && out(3L) == 2 && out(4L) == 3,
      s"negatives ranked hardest-first: $out")
  }

  test("minCos floor drops easy negatives") {
    val out = NegativeMining.semiHard(corpus, pairs, k = 10, minCos = 0.5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(2L, 3L), s"orthogonal candidate must fall below the floor: $out")
  }

  test("IVF path with all lists probed equals the exact band") {
    val quant = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val exact = NegativeMining.semiHard(corpus, pairs, k = 10)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val ivf = NegativeMining.semiHardIvf(corpus, pairs, quant, k = 10,
        nProbe = 2)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(ivf == exact, "full probing must reproduce the exact band")
  }

  test("IVF candidates stay inside probed lists") {
    val quant = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // nProbe=1: anchor probes only the x-axis list; the orthogonal
    // candidate (list 1) must be invisible even though it's in the band
    val out = NegativeMining.semiHardIvf(corpus, pairs, quant, k = 10,
        nProbe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!out.contains(4L), "unprobed list must not contribute candidates")
    assert(out.contains(2L), "own-list candidates found")
  }
}

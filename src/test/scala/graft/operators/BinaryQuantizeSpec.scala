package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryQuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("signPack: hand-computed words, zero/negative clear, bit 63 sets") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 3.0f, 0.0f)),             // bits 0,2 → 5
      (2L, Array(-1.0f, -1.0f, -1.0f, -1.0f)),          // 0
      (3L, Array.fill(64)(1.0f))                         // all 64 bits set → -1
    ).toDF("vec_id", "embedding")
    val got4 = df.where($"vec_id" < 3)
      .select($"vec_id", BinaryQuantize.signPack($"embedding", 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got4(1L) == Seq(5L))
    assert(got4(2L) == Seq(0L))
    val got64 = df.where($"vec_id" === 3)
      .select(BinaryQuantize.signPack($"embedding", 64)).head().getSeq[Long](0)
    assert(got64 == Seq(-1L)) // 0xFFFF... includes the sign bit via OR
  }

  test("signPack: dim > 64 spills into a second word in coordinate order") {
    // 70 dims: positive at 0 and 65 → word0 bit0 = 1, word1 bit1 = 2
    val v = Array.tabulate(70)(i => if (i == 0 || i == 65) 1.0f else -1.0f)
    val sig = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(BinaryQuantize.signPack($"embedding", 70)).head().getSeq[Long](0)
    assert(sig == Seq(1L, 2L))
  }

  test("hamming: packed xor+popcount equals coordinate sign mismatches") {
    val a = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(64)(i => if (i % 5 == 0) 1.0f else -1.0f)
    val expected = (0 until 64).count(i => (i % 3 == 0) != (i % 5 == 0))
    val df = Seq((1L, a, b)).toDF("id", "va", "vb")
    val got = df.select(BinaryQuantize.hamming(
      BinaryQuantize.signPack($"va", 64),
      BinaryQuantize.signPack($"vb", 64))).head().getInt(0)
    assert(got == expected)
  }

  test("binaryTopK: identical vector at Hamming 0 ranks first; id tie-break") {
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val flip1 = base.updated(7, -base(7))
    val far = base.map(x => -x)
    val corpus = Seq((10L, base), (11L, flip1), (12L, far), (13L, base))
      .toDF("vec_id", "embedding")
    val q = Seq((1L, base)).toDF("vec_id", "embedding")
    val rows = BinaryQuantize.binaryTopK(corpus, q, k = 4, dim = 64)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 13L, 11L, 12L))
    assert(rows.map(_.getAs[Int]("hamming")).toSeq == Seq(0, 0, 1, 64))
  }

  test("rerankTopK: cosine order wins inside the Hamming pool") {
    // two vectors with the SAME sign pattern but different magnitudes:
    // Hamming can't separate them, the float rerank must
    val q = Array.tabulate(64)(_ => 1.0f)
    val close = Array.tabulate(64)(i => 1.0f + 0.01f * (i % 3))
    val skewed = Array.tabulate(64)(i => if (i < 4) 100.0f else 0.001f)
    val corpus = Seq((10L, close), (11L, skewed)).toDF("vec_id", "embedding")
    val queries = Seq((1L, q)).toDF("vec_id", "embedding")
    val rows = BinaryQuantize.rerankTopK(corpus, queries, k = 2, dim = 64,
      rerank = 2).orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L))
    assert(rows.head.getAs[Double]("cosine") > rows(1).getAs[Double]("cosine"))
  }

  test("rerank pool must cover k") {
    val df = Seq((1L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      BinaryQuantize.rerankTopK(df, df, k = 10, dim = 64, rerank = 5)
    }
  }
}

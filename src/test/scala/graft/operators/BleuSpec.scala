package graft.operators

import graft.SparkSpec

class BleuSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, String, String)]) =
    Bleu.sentenceBleu(rows.toDF("pair_id", "candidate", "reference"))

  test("identical texts score exactly 1") {
    val r = fit(Seq((1L, "the cat sat on the mat", "the cat sat on the mat")))
      .select("bleu").as[Double].head()
    assert(r == 1.0)
  }

  test("hand-computed clipped matches; zero 4-gram match zeroes plain BLEU") {
    val row = fit(Seq((1L, "the cat on the mat", "the cat sat on the mat")))
      .select("c_len", "r_len", "m1", "t1", "m2", "t2", "m3", "t3", "m4", "t4", "bleu")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Double)].head()
    assert(row == ((5L, 6L, 5L, 5L, 3L, 4L, 1L, 3L, 0L, 2L, 0.0)))
  }

  test("brevity penalty: perfect prefix candidate scores exp(1 - r/c)") {
    val r = fit(Seq((1L, "a b c d", "a b c d e")))
      .select("bleu").as[Double].head()
    assert(r == math.rint(math.exp(1.0 - 5.0 / 4.0) * 1e6) / 1e6)
  }

  test("empty candidate scores 0 with zero totals") {
    val row = fit(Seq((1L, "", "some reference text here")))
      .select("c_len", "t1", "bleu").as[(Long, Long, Double)].head()
    assert(row == ((0L, 0L, 0.0)))
  }

  test("clipping caps repeated tokens by the reference count") {
    // candidate spams 'the' x5; reference has it twice -> m1 = 2
    val row = fit(Seq((1L, "the the the the the", "the cat the mat")))
      .select("m1", "t1").as[(Long, Long)].head()
    assert(row == ((2L, 5L)))
  }

  test("corpus BLEU sums integer censuses before the chain") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d e"),
      (2L, "x y z", "x y z")).toDF("pair_id", "candidate", "reference")
    val corp = Bleu.corpusBleu(pairs)
      .select("c_len", "r_len", "m1", "t1", "m4", "t4")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // c = 4+3, r = 5+3; m1 = 4+3; t4 = 1+0 (3-token pair has no 4-gram)
    assert(corp == ((7L, 8L, 7L, 7L, 1L, 1L)))
  }
}

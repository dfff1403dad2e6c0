package graft.operators

import graft.SparkSpec

class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, String, String)]) =
    Rouge.rougeL(rows.toDF("pair_id", "candidate", "reference"))

  test("identical texts score exactly 1") {
    val r = fit(Seq((1L, "the cat sat on the mat", "the cat sat on the mat")))
      .select("rouge_l").as[Double].head()
    assert(r == 1.0)
  }

  test("classic textbook LCS: abcbdab vs bdcaba -> 4") {
    val row = fit(Seq((1L, "a b c b d a b", "b d c a b a")))
      .select("c_len", "r_len", "lcs", "rouge_l")
      .as[(Long, Long, Long, Double)].head()
    // F1 = 2*4/(7+6) = 8/13
    assert(row == ((7L, 6L, 4L, math.rint(8.0 / 13.0 * 1e6) / 1e6)))
  }

  test("substitution drops matched tokens but keeps order") {
    val row = fit(Seq((1L, "the cat sat", "the dog sat")))
      .select("lcs", "rouge_l").as[(Long, Double)].head()
    assert(row == ((2L, math.rint(4.0 / 6.0 * 1e6) / 1e6)))
  }

  test("LCS is order-sensitive, unlike bag overlap") {
    val r = fit(Seq((1L, "c b a", "a b c"))).select("lcs").as[Long].head()
    assert(r == 1L) // any single token, never 3
  }

  test("empty candidate scores 0 with zero lcs") {
    val row = fit(Seq((1L, "", "some reference")))
      .select("c_len", "lcs", "rouge_l").as[(Long, Long, Double)].head()
    assert(row == ((0L, 0L, 0.0)))
  }

  test("corpus ROUGE-L sums integer censuses before the chain") {
    val pairs = Seq(
      (1L, "a b c b d a b", "b d c a b a"),
      (2L, "x y", "x y")).toDF("pair_id", "candidate", "reference")
    val corp = Rouge.corpusRougeL(pairs)
      .select("c_len", "r_len", "lcs", "rouge_l")
      .as[(Long, Long, Long, Double)].head()
    // lcs 4+2, c 7+2, r 6+2 -> F = 12/17
    assert(corp == ((9L, 8L, 6L, math.rint(12.0 / 17.0 * 1e6) / 1e6)))
  }
}

package graft.operators

import graft.SparkSpec

class ChrFSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, String, String)]) =
    ChrF.chrF(rows.toDF("pair_id", "candidate", "reference"))

  test("identical texts score exactly 1") {
    val r = fit(Seq((1L, "the cat sat on the mat", "the cat sat on the mat")))
      .select("chrf").as[Double].head()
    assert(r == 1.0)
  }

  test("hand-computed censuses and F_2 on ab vs abc") {
    // space-free chars: cand "ab" (2), ref "abc" (3)
    // n=1: m=2 t=2 rt=3; n=2: m=1 t=1 rt=2; n=3: m=0 t=0 rt=1; n>=4: all 0
    val row = fit(Seq((1L, "ab", "abc")))
      .select("c_chars", "r_chars", "m1", "t1", "rt1", "m2", "t2", "rt2",
        "m3", "t3", "rt3", "chrf")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Double)]
      .head()
    // P = (2/2 + 1/1)/2 = 1; R = (2/3 + 1/2 + 0/1)/3 = 7/18
    // F_2 = 5PR/(4P+R) = (35/18)/(79/18) = 35/79
    val f = math.rint(35.0 / 79.0 * 1e6) / 1e6
    assert(row == ((2L, 3L, 2L, 2L, 3L, 1L, 1L, 2L, 0L, 0L, 1L, f)))
  }

  test("spaces are removed before char-gramming") {
    val r = fit(Seq((1L, "a b c d e f g", "abcdefg")))
      .select("chrf").as[Double].head()
    assert(r == 1.0)
  }

  test("empty candidate scores 0 with zero candidate totals") {
    val row = fit(Seq((1L, "", "some reference")))
      .select("c_chars", "t1", "chrf").as[(Long, Long, Double)].head()
    assert(row == ((0L, 0L, 0.0)))
  }

  test("clipping caps repeated char-grams by the reference count") {
    // cand "aaaa": 1-grams a x4; ref "aab": a x2 -> m1 = 2
    val row = fit(Seq((1L, "aaaa", "aab")))
      .select("m1", "t1").as[(Long, Long)].head()
    assert(row == ((2L, 4L)))
  }

  test("Fast (xxhash64) and Portable (md5) schemes produce identical scores") {
    val pairs = Seq(
      (1L, "the quick brown fox", "the quick brown dog"),
      (2L, "aaaa", "aab"),
      (3L, "", "some reference"),
      (4L, "identical words here", "identical words here"))
      .toDF("pair_id", "candidate", "reference")
    def rows(s: HashScheme) = ChrF.chrF(pairs, s)
      .orderBy("pair_id").collect().map(_.toString).toSeq
    assert(rows(HashScheme.Portable) == rows(HashScheme.Fast),
      "gram-key scheme must not change any census count or score")
  }

  test("null texts keep null chars, zero totals, chrf 0 (length(null) semantics)") {
    val rows = Seq((1L, null.asInstanceOf[String], "some reference"),
      (2L, "some candidate", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("pair_id", "candidate", "reference")
    val out = ChrF.chrF(rows)
      .select("pair_id", "c_chars", "r_chars", "t1", "rt1", "m1", "chrf")
      .orderBy("pair_id").collect()
    // pair 1: null candidate -> c_chars null, t1 = 0
    assert(out(0).isNullAt(1) && !out(0).isNullAt(2))
    assert(out(0).getLong(3) == 0L && out(0).getLong(4) == 13L)
    assert(out(0).getDouble(6) == 0.0)
    // pair 2: null reference
    assert(!out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(1).getLong(3) == 13L && out(1).getLong(4) == 0L)
    // pair 3: both null
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    assert(out(2).getLong(5) == 0L && out(2).getDouble(6) == 0.0)
  }

  test("corpus chrF sums integer censuses before the chain") {
    val pairs = Seq(
      (1L, "ab", "abc"),
      (2L, "xy", "xy")).toDF("pair_id", "candidate", "reference")
    val corp = ChrF.corpusChrF(pairs)
      .select("c_chars", "r_chars", "m1", "t1", "rt1", "m2", "t2", "rt2")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // chars 2+2 / 3+2; m1 = 2+2; t2 = 1+1; rt2 = 2+1
    assert(corp == ((4L, 5L, 4L, 4L, 5L, 2L, 2L, 3L)))
  }
}

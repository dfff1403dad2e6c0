package graft.operators

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {

  import spark.implicits._

  private def score(text: String): (Long, Long, Long, Option[Double]) = {
    val r = TextAnalysis.readability(Seq((1L, text)).toDF("doc_id", "text")).head()
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("hand-computed counts and score") {
    // "the cat sat." → 3 words, 1 sentence, syllables: the=1, cat=1, sat=1
    val (w, s, sy, f) = score("the cat sat.")
    assert((w, s, sy) == (3L, 1L, 3L))
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(f.exists(v => math.abs(v - 119.19) < 1e-6))
  }

  test("multi-sentence and vowel groups") {
    // "beautiful idea! really?" → words 3; sentences 2 ([!] and [?]);
    // syllables: beau-ti-ful = eau,i,u → 3; idea = i,ea → 2; really =
    // ea,y → 2 → 7
    val (w, s, sy, _) = score("beautiful idea! really?")
    assert((w, s, sy) == (3L, 2L, 7L))
  }

  test("no sentence punctuation floors sentences at 1; no vowels floor at 1/word") {
    val (w, s, sy, _) = score("xyz qrst")
    assert((w, s, sy) == (2L, 1L, 2L))
  }

  test("empty and null-ish docs carry null score") {
    assert(score("")._4.isEmpty)
    assert(score("   ")._4.isEmpty)
    assert(score("...")._4.isEmpty) // punctuation only: 0 words
  }

  test("simple text scores higher than polysyllabic text") {
    val easy = score("the dog ran. the cat sat. it was fun.")._4.get
    val hard = score("incomprehensibility characterizes institutionalization.")._4.get
    assert(easy > hard)
  }
}

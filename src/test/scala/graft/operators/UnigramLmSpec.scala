package graft.operators

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-probability split, not the greedy one") {
    // greedy longest-match would take 'abc' then be forced into c-level
    // pieces; the best split is ab + cd when their scores dominate
    val m = UnigramLm.Model(Map(
      "abc" -> -10L, "ab" -> -2L, "cd" -> -2L, "d" -> -8L,
      "a" -> -9L, "b" -> -9L, "c" -> -9L), maxPieceLen = 4)
    assert(UnigramLm.viterbi("abcd", m) == Some(List("ab", "cd")),
      "ab+cd (-4) must beat abc+d (-18)")
  }

  test("ties break toward the longer final piece") {
    val m = UnigramLm.Model(Map(
      "ab" -> -4L, "a" -> -2L, "b" -> -2L), maxPieceLen = 2)
    // 'ab' total -4 == 'a'+'b' total -4: l=2 wins the tie
    assert(UnigramLm.viterbi("ab", m) == Some(List("ab")))
  }

  test("unseen character makes the word unsegmentable") {
    val m = UnigramLm.Model(Map("a" -> -1L), maxPieceLen = 2)
    assert(UnigramLm.viterbi("ax", m).isEmpty)
    val out = UnigramLm.segmentWords(Seq("aa", "ax").toDF("word"), m)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("ax") == WordPiece.Unk && out("aa") == "a a")
  }

  test("logp_micro equals the sum of chosen piece scores") {
    val m = UnigramLm.Model(Map("ab" -> -3L, "a" -> -5L, "b" -> -5L),
      maxPieceLen = 2)
    val r = UnigramLm.segmentWords(Seq("abab").toDF("word"), m)
      .collect().head
    assert(r.getString(1) == "ab ab" && r.getLong(3) == -6L)
  }

  test("one EM round re-estimates scores from the chosen segmentations") {
    // corpus: one very frequent word — the whole-word piece wins every
    // Viterbi split (log10(8/80) = -1 beats ab+ab = 2·log10(16/80) ≈
    // -1.40), absorbs the mass in the M-step, and every unchosen piece
    // falls to the add-one floor
    val docs = Seq((1L, "abab abab abab abab abab abab abab abab")).toDF("doc_id", "text")
    val m0 = UnigramLm.train(docs, rounds = 0, minCount = 2L)
    val m1 = UnigramLm.train(docs, rounds = 1, minCount = 2L)
    assert(m0.scores.keySet == m1.scores.keySet, "vocabulary is fixed")
    assert(m1.scores("abab") > m0.scores("abab"),
      s"abab: ${m0.scores("abab")} -> ${m1.scores("abab")}")
    assert(m1.scores("ab") < m0.scores("ab"),
      s"ab: ${m0.scores("ab")} -> ${m1.scores("ab")}")
    // and the chosen segmentation stays the singleton under m1
    assert(UnigramLm.viterbi("abab", m1) == Some(List("abab")))
  }

  test("maxWordLen excludes long words from census and EM") {
    val docs = Seq((1L, "aa aa aa verylongword")).toDF("doc_id", "text")
    val m = UnigramLm.train(docs, rounds = 1, minCount = 1L, maxWordLen = 4)
    assert(!m.scores.contains("very"), "long word must not seed pieces")
    assert(m.scores.contains("aa"))
  }
}

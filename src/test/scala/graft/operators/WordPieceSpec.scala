package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // piece sets hold BARE strings; the ## prefix is applied at emit time
  private val m = WordPiece.Model(
    init = Set("un", "runn", "r", "u", "n", "a", "b", "x"),
    cont = Set("able", "nin", "ing", "n", "g", "a", "e", "i", "b", "l"),
    maxPieceLen = 4)

  test("greedy longest match, init vs continuation tables") {
    // "unrunnable": un | runn? no — after 'un' we're in CONT table:
    // cont has no 'runn'; walk: un -> a? position 3 'r'... craft simpler:
    // "runnable" = runn(init,4) + able(cont) — longest first
    assert(WordPiece.segment("runnable", m) == Some(List("runn", "##able")))
    // greedy prefers 'runn' (4) over 'r'/'u' shorter pieces
    assert(WordPiece.segment("running", m) == Some(List("runn", "##ing")))
  }

  test("continuation pieces never match word-initially and vice versa") {
    // 'able' exists only as continuation: word 'able' must walk chars
    // via init table — 'a' init exists, then 'b','l','e' continuation
    assert(WordPiece.segment("able", m) == Some(List("a", "##b", "##l", "##e")))
  }

  test("unseen character collapses the word to [UNK]") {
    assert(WordPiece.segment("piz", m).isEmpty, "z is in neither table")
    val full = WordPiece.encodeWords(Seq("piz", "runnable").toDF("word"), m)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(full == Seq(("piz", "[UNK]", 1L), ("runnable", "runn ##able", 2L)))
  }

  test("vocabulary census: init/cont separated, chars always kept") {
    val docs = Seq((1L, "aa ab aa"), (2L, "aa ba")).toDF("doc_id", "text")
    val v = WordPiece.vocabulary(docs, maxPieceLen = 2, minCount = 3L)
      .as[(Boolean, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // 'aa' word-initial piece: words aa(freq 3) contribute substr pos1 len2
    assert(v((false, "aa")) == 3L, "aa init piece from three aa occurrences")
    // 'a' continuation: pos2 of aa (3), pos2 of ba (1)
    assert(v((true, "a")) == 4L)
    // single chars survive even below minCount: 'b' init from ba only
    assert(v((false, "b")) == 1L)
    // two-char piece below minCount is dropped: 'ab' init freq 1
    assert(!v.contains((false, "ab")))
  }

  test("doc-grain encode rolls up pieces and UNKs per document") {
    val train = Seq((0L, "abc abc ddd")).toDF("doc_id", "text")
    val model = WordPiece.model(WordPiece.vocabulary(train, maxPieceLen = 3,
      minCount = 1L))
    val serve = Seq((1L, "abc ddd xyz")).toDF("doc_id", "text")
    val out = WordPiece.encode(serve, model)
      .as[(Long, Long, Long, Long)].head()
    // abc -> 1 piece, ddd -> 1 piece, xyz -> [UNK] (x,y,z unseen)
    assert(out == ((1L, 3L, 3L, 1L)), s"got $out")
  }
}

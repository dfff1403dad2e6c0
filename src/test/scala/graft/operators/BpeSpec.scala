package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // words: aaab (freq 2), aab (freq 1)
  private val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")

  test("hand-computed merge sequence: counts, tiebreaks, application") {
    val r = Bpe.train(docs, nMerges = 3)
    // round 1: (a,a) count 5; round 2: (b,</w>) count 3;
    // round 3: tie at 2 between "a b</w>" and "aa a" — lexicographic
    // ascending picks "a b</w>" (space < 'a')
    assert(r.merges == Seq(("a", "a", 5L), ("b", "</w>", 3L), ("a", "b</w>", 2L)),
      s"unexpected merges: ${r.merges}")
    val census = Bpe.subwordCensus(r)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(census == Map("aa" -> 3L, "ab</w>" -> 2L, "b</w>" -> 1L),
      s"unexpected subword census: $census")
  }

  test("same-symbol runs merge odd occurrences per round (documented variant)") {
    val run = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = Bpe.train(run, nMerges = 1)
    assert(r.merges.head._1 == "a" && r.merges.head._2 == "a")
    val syms = r.words.select("syms").head().getString(0)
    // one non-overlapping pass: the consumed boundary space hides the
    // second adjacency until a later round
    assert(syms == "aa a a </w>", s"got '$syms'")
  }

  test("merge table carries rank order; exhaustion fails loudly") {
    val t = Bpe.mergeTable(Bpe.train(docs, nMerges = 2), docs)
      .orderBy("rank").collect()
    assert(t.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(t.head.getString(3) == "aa", "merged symbol = left+right")
    val e = intercept[IllegalArgumentException] { Bpe.train(docs, nMerges = 1000) }
    assert(e.getMessage.contains("exhausted"))
  }

  test("multilingual words symbolize per character") {
    val zh = Seq((1L, "中文 中文")).toDF("doc_id", "text")
    val r = Bpe.train(zh, nMerges = 1)
    // only word "中文" → syms "中 文 </w>"; top pair is ("中", "文") or
    // ("文", "</w>") — counts tie at 2, lexicographic ascending decides
    assert(r.merges.head._3 == 2L)
    assert(Bpe.subwordCensus(r).count() == 2)
  }
}

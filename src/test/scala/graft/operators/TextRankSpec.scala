package graft.operators

import graft.SparkSpec

class TextRankSpec extends SparkSpec {

  import spark.implicits._

  test("edges: adjacency over the FILTERED sequence, symmetrized, distinct") {
    // minLen 4 drops "a" and "of": "alpha a beta" pairs alpha-beta
    val docs = Seq((1L, "alpha a beta of alpha beta")).toDF("doc_id", "text")
    val got = TextRank.cooccurrenceEdges(docs, minLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("alpha", "beta"), ("beta", "alpha")))
  }

  test("self-pairs from repeated tokens are dropped") {
    val docs = Seq((1L, "word word other")).toDF("doc_id", "text")
    val got = TextRank.cooccurrenceEdges(docs, minLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("word", "other"), ("other", "word")))
  }

  test("hub term outranks peripheral terms") {
    // "core" co-occurs with everything; leaves only with core
    val docs = Seq(
      (1L, "core alfa"), (2L, "core bravo"), (3L, "core charlie"),
      (4L, "core delta"), (5L, "echo core")
    ).toDF("doc_id", "text")
    val top = TextRank.keywords(docs, k = 6, iterations = 5).collect()
    assert(top.head.getAs[String]("term") == "core")
    assert(top.head.getAs[Int]("rank") == 1)
    // ranks are 1..n dense and ordered by pr desc
    assert(top.map(_.getAs[Int]("rank")).toSeq == (1 to top.length).toSeq)
  }

  test("per-doc keywords: ranks are independent across docs") {
    // doc 1's hub is "core"; doc 2's is "other" — each doc's top term is
    // its own hub regardless of the other doc's graph
    val docs = Seq(
      (1L, "core alfa core bravo core delta"),
      (2L, "other echo other golf")
    ).toDF("doc_id", "text")
    val top = TextRank.keywordsPerDoc(docs, k = 1, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top == Map(1L -> "core", 2L -> "other"))
    // a doc with no qualifying bigram yields no rows, others unaffected
    val mixed = docs.unionByName(Seq((3L, "solo")).toDF("doc_id", "text"))
    val got = TextRank.keywordsPerDoc(mixed, k = 1, iterations = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("single-token and empty docs contribute no edges") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "   "), (4L, "pair here"))
      .toDF("doc_id", "text")
    val edges = TextRank.cooccurrenceEdges(docs, minLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("pair", "here"), ("here", "pair")))
  }
}

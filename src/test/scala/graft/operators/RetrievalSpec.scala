package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple apple apple apple banana"),
    (3L, "cherry cherry durian"),
    (4L, "banana cherry apple durian elderberry"),
    (5L, "fig grape fig grape fig")
  ).toDF("doc_id", "text")

  private def queries(rows: (Long, String)*) =
    rows.toDF("query_id", "text")

  test("rarer query term dominates; ranks are contiguous from 1") {
    // "durian" (df=2) is rarer than "apple" (df=3): a doc matching only
    // durian must outrank a doc matching only apple for this query
    val out = Retrieval.bm25TopK(docs, queries(100L -> "durian apple"),
      k = 5, maxDfFrac = 1.0)
      .orderBy("rank").collect()
    assert(out.map(_.getInt(4)).toSeq == (1 to out.length),
      "ranks must be contiguous from 1")
    val byDoc = out.map(r => r.getLong(1) -> r.getInt(4)).toMap
    assert(byDoc(3L) < byDoc(2L),
      s"durian-only doc must outrank apple-only doc: $byDoc")
  }

  test("df cap drops ubiquitous terms from scoring") {
    // "apple" df=3/5 > 0.5 → capped out; only durian contributes
    val capped = Retrieval.bm25TopK(docs, queries(100L -> "durian apple"),
      k = 5, maxDfFrac = 0.5).collect()
    assert(capped.map(_.getLong(1)).toSet == Set(3L, 4L),
      "only durian-bearing docs may score under the cap")
    val uncapped = Retrieval.bm25TopK(docs, queries(100L -> "durian apple"),
      k = 5, maxDfFrac = 1.0).collect()
    assert(uncapped.length > capped.length)
  }

  test("longer docs score below shorter docs at equal tf (length norm)") {
    val out = Retrieval.bm25TopK(docs, queries(101L -> "banana"),
      k = 5, maxDfFrac = 1.0)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // banana tf=1 in docs 1 (len 4) and 4 (len 5): shorter doc wins
    assert(out(1L) > out(4L),
      s"length normalization must favor the shorter doc: $out")
  }

  test("vsmTopK: exact-match doc scores cosine 1; idf favors rare terms") {
    // query identical to doc 5's term multiset → cosine exactly 1.0
    val out = Retrieval.vsmTopK(docs,
      queries(100L -> "fig grape fig grape fig"), k = 5, maxDfFrac = 1.0)
      .orderBy("rank").collect()
    assert(out.head.getLong(1) == 5L)
    assert(out.head.getDouble(2) == 1.0)
    // VSM vs BM25, deliberately opposite verdicts on the same query:
    // BM25 sums idf-weighted contributions → the rare "durian" match
    // wins (pinned in the bm25 test above); COSINE ranks by ANGLE →
    // doc 2 (4×apple, nearly parallel to the query's apple axis)
    // outranks doc 3, whose durian is buried under off-axis cherry
    // mass. Both behaviors are correct; a retrieval stack fuses them
    // precisely because they disagree like this.
    val mixed = Retrieval.vsmTopK(docs, queries(200L -> "durian apple"),
      k = 5, maxDfFrac = 1.0).collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(mixed(2L) < mixed(3L),
      s"cosine must rank the aligned doc above the buried rare term: $mixed")
  }

  test("rrfFuse: consensus beats a single top rank; micro sums are exact") {
    val sysA = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sysB = Seq((1L, 20L, 1), (1L, 30L, 2), (1L, 40L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(sysA, sysB), topK = 4)
      .orderBy("rank").collect()
    // doc 20 (ranks 2+1) must beat doc 10 (rank 1 in one system only)
    assert(out.head.getLong(1) == 20L,
      s"consensus doc must fuse to the top: ${out.toSeq}")
    def micro(ranks: Int*): Long =
      ranks.map(r => math.round(1.0 / (60.0 + r) * 1e6)).sum
    val byDoc = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byDoc(20L) == micro(2, 1) && byDoc(10L) == micro(1)
      && byDoc(30L) == micro(3, 2) && byDoc(40L) == micro(3))
    assert(out.map(_.getInt(4)).toSeq == (1 to 4), "fused ranks contiguous")
  }

  test("empty or unmatched queries yield no rows; k bounds output") {
    val out = Retrieval.bm25TopK(docs,
      queries(102L -> "zzz", 103L -> "", 104L -> "apple"), k = 2,
      maxDfFrac = 1.0)
    val rows = out.collect()
    assert(rows.forall(_.getLong(0) == 104L), "only the apple query matches")
    assert(rows.length == 2, "k=2 must bound the per-query output")
  }

  test("phraseSearch: order matters, occurrences counted, bag-of-words rejected") {
    val queries = Seq(
      (201L, "apple banana"),   // docs 1, 2 consecutively; doc 4 has both but NOT adjacent
      (202L, "banana cherry apple"), // only doc 4 has this exact run
      (203L, "fig grape"),      // twice in doc 5
      (204L, "apple apple")     // repeated term: doc 2 has three adjacent pairs
    ).toDF("query_id", "text")
    val out = Retrieval.phraseSearch(queries, docs, topK = 10)
      .select("query_id", "doc_id", "n_hits")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((201L, 1L, 1L)) && out.contains((201L, 2L, 1L)),
      s"adjacent apple-banana in docs 1 and 2: $out")
    assert(!out.exists(r => r._1 == 201L && r._2 == 4L),
      "doc 4 has both terms but not adjacent — bag-of-words must not match")
    assert(out.filter(_._1 == 202L) == Set((202L, 4L, 1L)),
      "a 3-term run matches exactly its source doc")
    assert(out.contains((203L, 5L, 2L)), "fig-grape occurs twice in doc 5")
    assert(out.contains((204L, 2L, 3L)),
      s"apple apple: three adjacent pairs in doc 2: $out")
  }

  test("phraseSearch: candidates past the doc end or before its start " +
      "never match (doc-grain slice verification edges)") {
    // df(kiwi)=2 < df(lime)=3, so "lime kiwi" anchors on kiwi at offset 1:
    // doc 7's kiwi sits at position 0 → base = −1 (before-start candidate,
    // must be rejected); doc 8 holds the genuine run. "kiwi lime lime"
    // anchors on kiwi at offset 0: every candidate slice overruns its
    // doc's end (docs 7/8 are 2 tokens) and must be rejected.
    val extra = docs.unionByName(Seq(
      (7L, "kiwi lime"), (8L, "lime kiwi"), (9L, "lime zest"))
      .toDF("doc_id", "text"))
    val hit = Retrieval.phraseSearch(queries(401L -> "lime kiwi"), extra,
        topK = 10)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toSet
    assert(hit == Set((8L, 1L)), s"only doc 8 holds the exact run: $hit")
    val none = Retrieval.phraseSearch(queries(402L -> "kiwi lime lime"),
      extra, topK = 10).collect()
    assert(none.isEmpty,
      s"a window overrunning every doc's end must not match: ${none.toSeq}")
  }

  test("phraseSearch ranks by occurrence count with doc tiebreak") {
    val queries = Seq((301L, "fig grape")).toDF("query_id", "text")
    val extra = docs.unionByName(Seq((6L, "fig grape")).toDF("doc_id", "text"))
    val ranked = Retrieval.phraseSearch(queries, extra, topK = 10)
      .orderBy("rank").select("doc_id", "n_hits")
      .as[(Long, Long)].collect().toSeq
    assert(ranked == Seq((5L, 2L), (6L, 1L)))
  }

  test("ndcgAt: perfect ranking scores 1, swaps lose, unjudged earn rel 0") {
    val judg = Seq((1L, 10L, 3L), (1L, 11L, 1L), (1L, 12L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val perfect = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val p = Retrieval.ndcgAt(perfect, judg, k = 3).head()
    assert(p.getLong(1) === p.getLong(2) && p.getDouble(3) === 1.0)
    // best doc last + an unjudged doc in the list
    val bad = Seq((1L, 99L, 1), (1L, 11L, 2), (1L, 10L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Retrieval.ndcgAt(bad, judg, k = 3).head()
    assert(b.getDouble(3) < 1.0 && b.getDouble(3) > 0.0)
    // hand check: dcg = 0·d1 + 1·d2 + 7·d3; idcg = 7·d1 + 1·d2 + 1·d3
    def d(r: Int) = math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))
    assert(b.getLong(1) === 1L * d(2) + 7L * d(3))
    assert(b.getLong(2) === 7L * d(1) + 1L * d(2) + 1L * d(3))
  }
}

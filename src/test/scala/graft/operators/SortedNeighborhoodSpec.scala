package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  test("ranked: dense 0-based rank under the (key, doc_id) total order") {
    val docs = Seq((3L, "bb"), (1L, "aa"), (2L, "aa"), (4L, "cc"))
      .toDF("doc_id", "text")
    val got = SortedNeighborhood.ranked(docs, col("text"), shards = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("candidatePairs: exactly the pairs within sort distance < w") {
    // order by text: 1(aa), 2(ab), 3(ac), 4(zz) → w=2 pairs only adjacent
    val docs = Seq((1L, "aa"), (2L, "ab"), (3L, "ac"), (4L, "zz"))
      .toDF("doc_id", "text")
    val w2 = SortedNeighborhood.candidatePairs(docs, col("text"), w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w2 == Set((1L, 2L), (2L, 3L), (3L, 4L)))
    val w3 = SortedNeighborhood.candidatePairs(docs, col("text"), w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w3 == Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L)))
  }

  test("pairs crossing the block boundary are found (adjacent-block join)") {
    // 10 docs, w=4: every consecutive pair must appear regardless of
    // which w-block the seq lands in
    val docs = (0L until 10L).map(i => (i, f"k$i%02d")).toDF("doc_id", "text")
    val got = SortedNeighborhood.candidatePairs(docs, col("text"), w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0L until 9L)
      assert(got.contains((i, i + 1)), s"missing adjacent pair ($i, ${i + 1})")
    assert(got.size == 9 + 8 + 7) // distances 1, 2, 3
  }

  test("nearDuplicates: identical neighbors pass, dissimilar neighbors filtered") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // identical → adjacent, J=1
      (3L, "alpha beta gamma epsilon"), // J = 3/5 vs 1,2 → below 0.9
      (4L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val got = SortedNeighborhood.nearDuplicates(docs,
        TextAnalysis.normalized(col("text")), w = 4, tNum = 9, tDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}

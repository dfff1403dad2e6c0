package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CardLeakageSpec extends SparkSpec {

  import spark.implicits._

  test("dedup-adjusted card counts each distinct content once per group") {
    val docs = Seq(
      (1L, "en", "s", "a b c"), (2L, "en", "s", "a b c"), // dup pair
      (3L, "en", "s", "x y")).toDF("doc_id", "lang", "source", "text")
    val r = CorpusStats.dedupAdjustedCard(docs).head()
    assert(r.getLong(2) === 3L) // n_docs
    assert(r.getLong(3) === 2L) // unique contents
    assert(r.getLong(4) === 8L) // raw: 3 + 3 + 2
    assert(r.getLong(5) === 5L) // unique: 3 + 2
    assert(r.getDouble(6) === 0.375)
  }

  test("split leakage counts cross-split copy pairs; same-split pairs don't leak") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "other")).toDF("doc_id", "text")
    val asg = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "test"))
      .toDF("doc_id", "split")
    val out = Dedup.splitLeakage(docs, asg).collect()
    // fp group {1,2,3}: train {1,3}, test {2} → 2 cross pairs
    assert(out.length === 1)
    assert((out.head.getString(0), out.head.getString(1),
      out.head.getLong(2)) === (("test", "train", 2L)))
  }

  test("group-safe splits keyed on the fingerprint leak zero pairs") {
    val docs = (0 until 60).map(i => (i.toLong, s"content ${i % 20}"))
      .toDF("doc_id", "text")
    val safe = HashSplit.groupSafeSplits(
        docs.withColumn("_fp", TextAnalysis.fingerprint(col("text"))),
        col("_fp"), Seq("train" -> 0.5, "test" -> 0.5))
      .select("doc_id", "split")
    assert(Dedup.splitLeakage(docs, safe).count() === 0L)
  }
}

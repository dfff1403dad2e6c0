package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ThresholdSweepSpec extends SparkSpec {

  import spark.implicits._

  test("sweep counts pairs, touched docs, and one-pass removals per bar") {
    // doc1 ≡ doc2 (J=1.0); doc3 shares half its shingles with doc2
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.thresholdSweep(pairs, docs,
        thresholds = Seq(40, 80)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // (2,3): shingles of 5 tokens = 3 trigrams, sharing 2 → J = 2/4 = 0.5
    assert(out(40L) === ((2L, 3L, 2L))) // both pairs; docs 1,2,3; removed 2,3
    assert(out(80L) === ((1L, 2L, 1L))) // only the identical pair
  }

  test("zero-pair thresholds densify to explicit zero rows") {
    val docs = Seq((1L, "a b c d e"), (2L, "v w x y z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val rows = Dedup.thresholdSweep(pairs, docs, thresholds = Seq(50, 90))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(50L -> 0L, 90L -> 0L))
  }

  test("null-text pairs (null jaccard) never enter the grid; empty-empty is J=1") {
    val docs = Seq((1L, None: Option[String]), (2L, None), (3L, Some("a b c d")))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val rows = Dedup.thresholdSweep(pairs, docs, thresholds = Seq(30))
      .collect()
    assert(rows.length === 1)
    // (null,null): uni=0 → null jaccard, dropped; (null, doc3): J=0 < bar
    assert(rows.head.getLong(1) === 0L)
    // empty strings shingle to [""] — a REAL (trivial) match, J = 1.0
    val empt = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val e = Dedup.thresholdSweep(Seq((1L, 2L)).toDF("doc_a", "doc_b"), empt,
      thresholds = Seq(90)).head()
    assert(e.getLong(1) === 1L)
  }
}

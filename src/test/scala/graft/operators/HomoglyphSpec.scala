package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HomoglyphSpec extends SparkSpec {

  import spark.implicits._

  test("confusable table is 1:1 and folds to ASCII") {
    assert(Homoglyph.confusablesFrom.length === Homoglyph.confusablesTo.length)
    assert(Homoglyph.confusablesTo.forall(_ < 128))
    assert(Homoglyph.confusablesFrom.forall(_ >= 128),
      "fold sources must be non-ASCII (the fold must be idempotent)")
  }

  test("skeleton folds Cyrillic/fullwidth spoofs onto their ASCII target") {
    val out = Seq("pаypаl", "ｐａｙ", "plain")
      .toDF("t").select(Homoglyph.skeleton(col("t"))).as[String].collect()
    assert(out(0) === "paypal")
    assert(out(1) === "pay")
    assert(out(2) === "plain")
  }

  test("spoofPairs finds exactly the confusable twins") {
    val docs = Seq(
      (1L, "free money now"),
      (2L, "frее mоnеy now"), // е/о Cyrillic
      (3L, "free money now"), // exact duplicate of 1 — NOT a spoof pair
      (4L, "unrelated text")
    ).toDF("doc_id", "text")
    val pairs = Homoglyph.spoofPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)),
      s"got $pairs") // 1-3 equal raw text → excluded; 2 spoofs both
  }

  test("null texts are ignored") {
    val docs = Seq((1L, Some("a")), (2L, None)).toDF("doc_id", "text")
    assert(Homoglyph.spoofPairs(docs).count() === 0L)
  }
}

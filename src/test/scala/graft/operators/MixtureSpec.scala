package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {

  import spark.implicits._

  test("targets split the budget by normalized weights") {
    val docs = Seq(
      (1L, "web", "a b c d"), // 4 tokens
      (2L, "code", "x y"), // 2 tokens
      (3L, "books", "p q r s t u")) // 6 tokens
      .toDF("doc_id", "source", "text")
    val out = Mixture.solveRates(docs,
        Map("web" -> 5.0, "code" -> 3.0, "books" -> 2.0),
        budgetTokens = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4), r.getString(5)))).toMap
    assert(out("web") === ((4L, 500L, 125.0, "upsample")))
    assert(out("code") === ((2L, 300L, 150.0, "upsample")))
    assert(out("books") === ((6L, 200L, math.rint(200.0 / 6 * 1e6) / 1e6,
      "upsample")))
  }

  test("downsample and keep modes on exact boundaries") {
    val docs = Seq(
      (1L, "big", Seq.fill(900)("t").mkString(" ")),
      (2L, "even", Seq.fill(100)("t").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = Mixture.solveRates(docs, Map("big" -> 9.0, "even" -> 1.0),
        budgetTokens = 1000L)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(out("big") === "keep") // target 900 = observed 900
    assert(out("even") === "keep")
    val down = Mixture.solveRates(docs, Map("big" -> 1.0, "even" -> 1.0),
        budgetTokens = 200L)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(down("big") === "downsample") // target 100 < 900
  }

  test("empty-token sources report null factor") {
    val docs = Seq((1L, "nul", None: Option[String]), (2L, "ok", Some("a b")))
      .toDF("doc_id", "source", "text")
    val rows = Mixture.solveRates(docs, Map.empty, budgetTokens = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("nul").getLong(1) === 0L)
    assert(rows("nul").isNullAt(4))
  }
}

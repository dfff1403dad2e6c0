package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  test("AhoCorasick: classic he/she/his/hers — overlapping + fail-link outputs") {
    val pats = Seq("he", "she", "his", "hers")
    val ac = MultiPattern.AhoCorasick.build(pats)
    // "ushers" contains she (1..3), he (2..3), hers (2..5)
    assert(ac.matches("ushers").toSeq == Seq(0, 1, 3))
    assert(ac.matches("his").toSeq == Seq(2))
    assert(ac.matches("xyz").isEmpty)
    assert(ac.matches("").isEmpty)
    // pattern equal to the whole text, and repeated hits dedup
    assert(ac.matches("hehehe").toSeq == Seq(0))
  }

  test("AhoCorasick: pattern that is a prefix of another fires on both") {
    val ac = MultiPattern.AhoCorasick.build(Seq("tab", "table"))
    assert(ac.matches("a table").toSeq == Seq(0, 1))
    assert(ac.matches("tabs only").toSeq == Seq(0))
  }

  test("build rejects empty patterns and empty lists") {
    intercept[IllegalArgumentException](MultiPattern.AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](MultiPattern.AhoCorasick.build(Seq("a", "")))
  }

  test("tagMatches rejects non-ASCII patterns (Java vs SQL case-fold parity)") {
    // İ lowercases to i̇ (length 2) in Java but not in SQL lower() — the
    // automaton and the declarative twin would silently disagree
    val e = intercept[IllegalArgumentException](
      MultiPattern.tagMatches(Seq((1L, "x")).toDF("doc_id", "text"), Seq("İstanbul")))
    assert(e.getMessage.contains("ASCII"))
  }

  test("tagMatches: hand-checked hits, null text → zero hits, case folded") {
    val docs = Seq(
      (1L, "The SLOW scan hit a Table"),      // slow scan, scan, tab, table
      (2L, null.asInstanceOf[String]),
      (3L, "nothing relevant here"),
      (4L, "tabulate")                        // tab only
    ).toDF("doc_id", "text")
    val got = MultiPattern.tagMatches(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2)))
    assert(got(0) == ((1L, 4, Seq("scan", "slow scan", "tab", "table"))))
    assert(got(1) == ((2L, 0, Seq())))
    assert(got(2) == ((3L, 0, Seq())))
    assert(got(3) == ((4L, 1, Seq("tab"))))
  }

  test("automaton ≡ declarative scan twin on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = MultiPattern.tagMatches(docs)
      .select(col("doc_id"), col("n_hits"), array_join(col("hits"), ",").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val b = MultiPattern.tagMatchesScan(docs)
      .select(col("doc_id"), col("n_hits"), array_join(col("hits"), ",").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(a == b)
    assert(a.exists(_._2 > 0), "sample blocklist must hit the corpus")
  }

  test("filterBlocked: drop-any-hit policy keeps exactly the clean docs") {
    val docs = Seq((1L, "a spark flew"), (2L, "all clear"), (3L, "slow scan ahead"))
      .toDF("doc_id", "text")
    val kept = MultiPattern.filterBlocked(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ContingencySpec extends SparkSpec {

  import spark.implicits._

  /** hand-built event rows: 10 reports, 2 drugs, 3 reactions */
  lazy val events = Seq(
    // (report, drug, reaction)
    ("r1", "D1", "headache"), ("r1", "D1", "nausea"),
    ("r2", "D1", "headache"),
    ("r3", "D1", "headache"), ("r3", "D1", "rash"),
    ("r4", "D1", "nausea"),
    ("r5", "D2", "headache"),
    ("r6", "D2", "rash"), ("r6", "D2", "nausea"),
    ("r7", "D2", "rash"),
    ("r8", "D2", "rash"),
    ("r9", "D2", "nausea"),
    ("r10", "D1", "headache"), ("r10", "D2", "headache")
  ).toDF("safetyreportid", "chembl_id", "reaction_reactionmeddrapt")

  test("pairStatistics exact: hand-checked A/B/C/D") {
    val got = Contingency.pairStatistics(events, exact = true)
      .select("chembl_id", "reaction_reactionmeddrapt", "A", "B", "C", "D")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // D1: reports r1,r2,r3,r4,r10 (5); D1-headache: r1,r2,r3,r10 = 4
    // headache total: r1,r2,r3,r5,r10 = 5 → B = 1; C = 5-4 = 1; D = 10-5-5+4 = 4
    assert(got(("D1", "headache")) == ((4L, 1L, 1L, 4L)))
    // D2: r5..r10 (6); D2-rash: r6,r7,r8 = 3; rash total: r3,r6,r7,r8 = 4
    // B = 1, C = 3, D = 10-6-4+3 = 3
    assert(got(("D2", "rash")) == ((3L, 1L, 3L, 3L)))
  }

  test("LLR matches the reference formula computed independently") {
    def llr(a: Double, b: Double, c: Double, d: Double): Double = {
      val aterm = a * (math.log(a) - math.log(a + b))
      val cterm = c * (math.log(c) - math.log(c + d))
      val acterm = (a + c) * (math.log(a + c) - math.log(a + b + c + d))
      aterm + cterm - acterm
    }
    val got = Contingency.pairStatistics(events, exact = true)
      .select("chembl_id", "reaction_reactionmeddrapt", "llr")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got(("D1", "headache")) - llr(4, 1, 1, 4)) < 1e-12)
    assert(math.abs(got(("D2", "rash")) - llr(3, 1, 3, 3)) < 1e-12)
  }

  test("A=C edge: C=0 pairs are dropped by the null-propagating log (reference semantics)") {
    // drug D3 appears in exactly the reports that mention 'fever' → C = 0
    val ev = events.union(Seq(("r11", "D3", "fever"), ("r12", "D3", "fever"))
      .toDF("safetyreportid", "chembl_id", "reaction_reactionmeddrapt"))
    val pairs = Contingency.pairStatistics(ev, exact = true)
    assert(pairs.where($"chembl_id" === "D3").count() == 0)
  }

  test("windowed (reference plan) and grouped (scale plan) agree on small data") {
    // HLL++ is exact at these cardinalities, so both strategies must agree
    val win = Contingency.prepareForMonteCarloFromWindowed(
      Contingency.summaryStatisticsWindowed(events))
      .select("chembl_id", "reaction_reactionmeddrapt", "A", "B", "C", "D", "llr")
    val grp = Contingency.pairStatistics(events, exact = true)
      .select("chembl_id", "reaction_reactionmeddrapt", "A", "B", "C", "D", "llr")
    val w = win.collect().map(_.toSeq).toSet
    val g = grp.collect().map(_.toSeq).toSet
    assert(w == g)
  }

  test("windowed compat path releases its internal cache (storage stays flat)") {
    spark.catalog.clearCache()
    (1 to 3).foreach { _ =>
      val out = Contingency.prepareForMonteCarloFromWindowed(
        Contingency.summaryStatisticsWindowed(events, exact = true))
      out.count()
      // the report-grain persist must be released before the method
      // returns — repeated calls in one session may not accumulate
      // DataFrame cache entries
      assert(spark.sharedState.cacheManager.isEmpty,
        "prepareForMonteCarloFromWindowed leaked its report-grain cache")
    }
  }

  test("pair grain: one row per (drug, reaction)") {
    val pairs = Contingency.pairStatistics(events, exact = true)
    assert(pairs.groupBy("chembl_id", "reaction_reactionmeddrapt").count()
      .where($"count" > 1).count() == 0)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("dominant item converges to the top strength") {
    // 1 beats everyone always; 2 beats 3/4; 3 beats 4 — strict hierarchy
    val cmp = Seq(
      (1L, 2L, true), (1L, 3L, true), (1L, 4L, true),
      (2L, 3L, true), (2L, 4L, true), (3L, 4L, true),
      (1L, 2L, true), (2L, 3L, true), (3L, 4L, true)
    ).toDF("item_a", "item_b", "win_a")
    val fit = Preference.bradleyTerry(Preference.pairCensus(cmp), rounds = 8)
      .orderBy(desc("p_micro")).select("item").as[Long].collect().toSeq
    assert(fit == Seq(1L, 2L, 3L, 4L))
  }

  test("symmetric records give equal strengths; p sums to ~1e6") {
    val cmp = Seq(
      (1L, 2L, true), (1L, 2L, false),
      (1L, 3L, true), (1L, 3L, false),
      (2L, 3L, true), (2L, 3L, false)
    ).toDF("item_a", "item_b", "win_a")
    val fit = Preference.bradleyTerry(Preference.pairCensus(cmp), rounds = 5)
      .select("item", "p_micro").as[(Long, Long)].collect().toMap
    assert(fit.values.toSet.size == 1, s"equal records must fit equal: $fit")
    val total = fit.values.sum
    assert(math.abs(total - 1000000L) <= 3, s"normalized total drifted: $total")
  }

  test("winless item is clamped, never zero, and ranks last") {
    val cmp = Seq(
      (1L, 2L, true), (1L, 2L, true), (1L, 2L, true),
      (2L, 3L, true), (1L, 3L, true)
    ).toDF("item_a", "item_b", "win_a")
    val fit = Preference.bradleyTerry(Preference.pairCensus(cmp), rounds = 6)
      .select("item", "p_micro").as[(Long, Long)].collect().toMap
    assert(fit(3L) >= 1L)
    assert(fit(3L) == fit.values.min)
    assert(fit(1L) == fit.values.max)
  }

  test("supplier comparisons are canonical and deterministic") {
    val li = Seq(
      (10L, 1L, 100.0), (10L, 2L, 90.0), (10L, 3L, 90.0),
      (11L, 1L, 50.0), (11L, 2L, 60.0)
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val cmp = Preference.supplierComparisons(li)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(cmp == Set(
      (1L, 2L, true), (1L, 3L, true), (2L, 3L, true), // ties -> lower key wins
      (1L, 2L, false)))
  }
}

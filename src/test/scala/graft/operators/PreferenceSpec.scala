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

  private def elo(games: Seq[(Long, Long, Long, Long)]) =
    Preference.eloRatings(games.toDF("league", "seq", "winner", "loser"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("elo: hand-computed first games and zero-sum conservation") {
    // game 1: equal ratings -> E_w = 0.5, d = round(32e6 * 0.5) = 16e6
    val one = elo(Seq((0L, 1L, 10L, 20L)))
    assert(one((0L, 10L)) === ((1516000000L, 1L, 1L)))
    assert(one((0L, 20L)) === ((1484000000L, 1L, 0L)))
    // rematch won by the now-higher-rated player gains LESS than 16e6
    val two = elo(Seq((0L, 1L, 10L, 20L), (0L, 2L, 10L, 20L)))
    val gain2 = two((0L, 10L))._1 - 1516000000L
    assert(gain2 > 0 && gain2 < 16000000L, s"diminishing gain, got $gain2")
    // zero-sum: total rating mass is conserved exactly
    assert(two.values.map(_._1).sum === 2L * 1500000000L)
  }

  test("elo: an upset pays more than a favorite win") {
    // build a favorite via two wins, then compare the favorite's next
    // gain vs the underdog's upset gain from the same state
    val base = Seq((0L, 1L, 10L, 20L), (0L, 2L, 10L, 20L))
    val fav = elo(base :+ (0L, 3L, 10L, 20L))((0L, 10L))._1
    val ups = elo(base :+ (0L, 3L, 20L, 10L))((0L, 20L))._1
    val favGain = fav - elo(base)((0L, 10L))._1
    val upsGain = ups - elo(base)((0L, 20L))._1
    assert(upsGain > favGain)
    assert(upsGain > 16000000L && favGain < 16000000L)
  }

  test("elo: leagues are independent and order matters") {
    val mixed = elo(Seq((0L, 1L, 10L, 20L), (1L, 1L, 10L, 20L)))
    assert(mixed((0L, 10L)) === mixed((1L, 10L)),
      "same game in different leagues must produce identical ratings")
    // order sensitivity: swapping the sequence changes the final state
    val ab = elo(Seq((0L, 1L, 10L, 20L), (0L, 2L, 20L, 30L)))
    val ba = elo(Seq((0L, 2L, 10L, 20L), (0L, 1L, 20L, 30L)))
    assert(ab((0L, 20L))._1 !== ba((0L, 20L))._1)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MonteCarloSpec extends SparkSpec {

  import spark.implicits._

  lazy val events = {
    // 40 reports spread over 3 drugs × 4 reactions, skewed so D1-headache
    // is strongly associated
    val rows = (1 to 40).flatMap { i =>
      val r = s"r$i"
      if (i <= 15) Seq((r, "D1", "headache")) // strong signal
      else if (i <= 20) Seq((r, "D1", "nausea"))
      else if (i <= 28) Seq((r, "D2", "rash"), (r, "D2", "nausea"))
      else if (i <= 34) Seq((r, "D2", "headache"))
      else Seq((r, "D3", "dizziness")) ++
        (if (i % 2 == 0) Seq((r, "D3", "headache")) else Seq())
    }
    rows.toDF("safetyreportid", "chembl_id", "reaction_reactionmeddrapt")
  }
  lazy val pairs = Meddra.withEmptyCode(
    Contingency.pairStatistics(events, exact = true)).cache()

  test("output contract: (chembl_id, event, count, llr, critval, meddraCode)") {
    val out = MonteCarlo(pairs, percentile = 0.95, permutations = 50)
    assert(out.columns.toSeq ==
      Seq("chembl_id", "event", "count", "llr", "critval", "meddraCode"))
  }

  test("significant pairs pass llr > critval > 0 and are a subset of input") {
    val out = MonteCarlo(pairs, percentile = 0.95, permutations = 50).collect()
    out.foreach { r =>
      val llr = r.getDouble(3); val crit = r.getDouble(4)
      assert(llr > crit && crit > 0)
    }
    val inPairs = pairs.select("chembl_id", "reaction_reactionmeddrapt")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet.subsetOf(inPairs))
  }

  test("seeded runs are bit-identical; different seeds differ somewhere") {
    val a = MonteCarlo(pairs, 0.95, 50, seed = Some(42L))
      .orderBy("chembl_id", "event").collect().map(_.toSeq).toSeq
    val b = MonteCarlo(pairs, 0.95, 50, seed = Some(42L))
      .orderBy("chembl_id", "event").collect().map(_.toSeq).toSeq
    assert(a == b)
    val crit42 = MonteCarlo.criticalValues(pairs, 0.95, 50, Some(42L))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val crit43 = MonteCarlo.criticalValues(pairs, 0.95, 50, Some(43L))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(crit42.keySet == crit43.keySet)
    assert(crit42 != crit43)
  }

  test("criticalValues: one row per drug, finite values") {
    val crit = MonteCarlo.criticalValues(pairs, 0.95, 50, Some(42L)).collect()
    assert(crit.map(_.getString(0)).toSet == Set("D1", "D2", "D3"))
    crit.foreach(r => assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
  }
}

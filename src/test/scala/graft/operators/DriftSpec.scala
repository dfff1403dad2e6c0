package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  import spark.implicits._

  private def psiOf(a: Seq[Double], b: Seq[Double]): Double =
    Drift.psiTotal(Drift.psi(
      a.zipWithIndex.map(_.swap).toDF("id", "v"),
      b.zipWithIndex.map(_.swap).toDF("id", "v"),
      col("v"), 0.0, 100.0, 10)).head().getDouble(0)

  test("identical distributions score ~0; a hard shift scores big") {
    val base = (0 until 200).map(i => (i % 100).toDouble)
    assert(math.abs(psiOf(base, base)) < 1e-9)
    val shifted = base.map(v => math.min(v + 50.0, 99.9))
    val psi = psiOf(base, shifted)
    assert(psi > 0.25, s"hard shift must exceed the action threshold: $psi")
    // mild shift lands between
    val mild = base.map(v => math.min(v + 5.0, 99.9))
    val psiMild = psiOf(base, mild)
    assert(psiMild > 0 && psiMild < psi)
  }

  test("empty buckets take the 0.5 pseudo-count, no infinities") {
    // actual occupies buckets the baseline never does
    val a = Seq.fill(50)(5.0)
    val b = Seq.fill(50)(95.0)
    val psi = psiOf(a, b)
    assert(!psi.isInfinite && !psi.isNaN && psi > 1.0)
  }

  test("per-bucket terms: stable buckets contribute ~0") {
    val a = (0 until 100).map(i => (i % 10).toDouble * 10.0)
    val rows = Drift.psi(
      a.zipWithIndex.map(_.swap).toDF("id", "v"),
      a.zipWithIndex.map(_.swap).toDF("id", "v"),
      col("v"), 0.0, 100.0, 10).collect()
    assert(rows.forall(_.getAs[Long]("term_micro") == 0L))
  }

  test("abTest: A/A on a hash split shows no significant effect") {
    val events = (1L to 400L).map(u =>
      (u, new java.sql.Timestamp(1700000000000L + u), u, "click",
        if (u % 3 == 0) 200.0 else 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.abTest(events,
      col("event_type") === "click" && col("value") > 150.0).head()
    assert(r.getLong(0) + r.getLong(1) == 400L)
    val z = r.getDouble(4)
    assert(math.abs(z) < 2.0, s"A/A must not be significant: z=$z")
  }

  test("abTest: degenerate all-convert and none-convert yield null z") {
    val all = (1L to 50L).map(u =>
      (u, new java.sql.Timestamp(1700000000000L + u), u, "click", 999.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rAll = EventAnalytics.abTest(all, col("event_type") === "click").head()
    assert(rAll.isNullAt(4))
    val rNone = EventAnalytics.abTest(all, col("event_type") === "nope").head()
    assert(rNone.isNullAt(4))
  }
}

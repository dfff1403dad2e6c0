package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  import spark.implicits._

  // 30 rows: ("a", x) appears 25×, ("b", y) 3×, ("c", z) 2× — only the
  // "a" group reaches k=5; sensitive value varies only inside "a".
  private def frame = {
    val rows =
      (1 to 25).map(i => ("a", "x", s"s${i % 4}")) ++
        (1 to 3).map(_ => ("b", "y", "s0")) ++
        (1 to 2).map(_ => ("c", "z", "s1"))
    rows.toDF("qa", "qb", "sens")
  }

  test("kAnonymityAudit flags exactly the under-k groups") {
    val audit = Privacy.kAnonymityAudit(frame, Seq(col("qa"), col("qb")), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(audit === Set(("a", 25L, true), ("b", 3L, false), ("c", 2L, false)))
  }

  test("anonymitySummary counts risky rows in exact ppm") {
    val s = Privacy.anonymitySummary(
      Privacy.kAnonymityAudit(frame, Seq(col("qa"), col("qb")), k = 5)).head()
    assert(s.getLong(0) === 3L) // n_groups
    assert(s.getLong(1) === 2L) // risky_groups
    assert(s.getLong(2) === 30L) // n_rows
    assert(s.getLong(3) === 5L) // risky_rows
    assert(s.getLong(4) === math.round(5.0 * 1e6 / 30.0)) // ppm
  }

  test("lDiversityAudit: a k-anonymous but homogeneous group fails") {
    val audit = Privacy.lDiversityAudit(
      frame, Seq(col("qa")), col("sens"), l = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(audit("a") === ((4L, true))) // s0..s3
    assert(audit("b") === ((1L, false))) // all s0 — homogeneity attack
    assert(audit("c") === ((1L, false)))
  }

  test("enforceKAnonymity suppresses exactly the risky rows") {
    val kept = Privacy.enforceKAnonymity(frame, Seq("qa", "qb"), k = 5)
    assert(kept.count() === 25L)
    assert(kept.where(col("qa") =!= "a").count() === 0L)
  }

  test("dpCounts: deterministic, noisy, and unbiased-ish across groups") {
    val df = (1 to 2000).map(i => (s"g${i % 50}", i)).toDF("g", "i")
    val a = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b, "same seed must reproduce the release exactly")
    val c = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a !== c, "a different seed must draw different noise")
    // every group's true count is 40; noise must actually perturb, and
    // the mean absolute noise should be in the Laplace(b=2) ballpark
    // (E|x| = b = 2), not degenerate at 0 or blown up.
    val noises = a.values.map(v => v / 1e6 - 40.0)
    assert(noises.count(_ != 0.0) > 45)
    val meanAbs = noises.map(math.abs).sum / noises.size
    assert(meanAbs > 0.5 && meanAbs < 8.0, s"mean |noise| = $meanAbs")
  }

  test("dpCounts handles null dimension values") {
    val df = Seq((Some("a"), 1), (None, 2), (None, 3)).toDF("g", "i")
    val out = Privacy.dpCounts(df, Seq("g"), epsilon = 1.0)
    assert(out.count() === 2L)
  }
}

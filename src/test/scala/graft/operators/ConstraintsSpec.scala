// (FunctionalDep coverage added at the bottom of this suite)
package graft.operators

import graft.SparkSpec
import graft.operators.Constraints._

class ConstraintsSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, Some("alpha"), Some(10L), Some("en")),
    (2L, Some("beta"), Some(20L), Some("de")),
    (3L, None, Some(-5L), Some("xx")),
    (4L, Some("gamma"), None, None),
    (4L, Some("delta"), Some(30L), Some("en"))  // duplicate id
  ).toDF("id", "name", "score", "lang")

  private def report(checks: Check*): Map[(String, String), (Option[Double], Boolean)] =
    validate(df, checks).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(4))
    }.toMap

  test("completeness counts nulls over ALL rows") {
    val got = report(Complete("name", 0.9), Complete("id", 1.0))
    assert(got(("complete", "name")) == (Some(0.8), false))
    assert(got(("complete", "id")) == (Some(1.0), true))
  }

  test("uniqueness is distinct over non-null; duplicate id fails PK check") {
    val got = report(Unique("id", 1.0))
    val (m, p) = got(("unique", "id"))
    assert(m.contains(0.8) && !p)
  }

  test("min/max bounds; max uses <=") {
    val got = report(MinValue("score", 0.0), MaxValue("score", 30.0))
    assert(got(("min_value", "score")) == (Some(-5.0), false))
    assert(got(("max_value", "score")) == (Some(30.0), true))
  }

  test("in_set and matches exclude nulls from the denominator") {
    // lang: 4 non-null, 3 in {en,de} → 0.75
    val got = report(InSet("lang", Seq("en", "de"), 0.7),
      Matches("name", "^[a-z]+$", 1.0))
    assert(got(("in_set", "lang")) == (Some(0.75), true))
    assert(got(("matches", "name")) == (Some(1.0), true))
  }

  test("empty input fails closed with null metrics") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val rows = validate(empty, Seq(Complete("name", 0.0), Unique("id", 0.0)))
      .collect()
    assert(rows.forall(!_.getBoolean(4)))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("orphans: referential integrity via anti join") {
    val ref = Seq(1L, 2L).toDF("rid")
    val n = Constraints.orphans(df, "id", ref, "rid").head().getLong(0)
    assert(n == 3) // ids 3, 4, 4
  }

  test("FunctionalDep: holds at exactly 1.0, violations lower the ratio") {
    val fd = Seq((1L, "a"), (1L, "a"), (2L, "b"), (3L, "a"))
      .toDF("k", "v")
    val ok = validate(fd, Seq(FunctionalDep("k", "v"))).head()
    assert(ok.getDouble(2) === 1.0 && ok.getBoolean(4))
    val bad = Seq((1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k", "v")
    val r = validate(bad, Seq(FunctionalDep("k", "v"))).head()
    // 2 determinants / 3 (k,v) pairs
    assert(r.getDouble(2) === math.round(2.0 / 3.0 * 1e6) / 1e6)
    assert(!r.getBoolean(4))
  }
}

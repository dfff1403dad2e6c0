package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HypothesisSpec extends SparkSpec {

  import spark.implicits._

  test("identical samples: D = 0, p = 1") {
    val a = (1 to 50).map(_.toLong).toDF("v")
    val r = Hypothesis.ksTest(a, a, col("v")).head()
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 1.0)
  }

  test("disjoint samples: D = 1, p ~ 0") {
    val a = (1 to 40).map(_.toLong).toDF("v")
    val b = (100 to 140).map(_.toLong).toDF("v")
    val r = Hypothesis.ksTest(a, b, col("v")).head()
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) < 0.001)
  }

  test("hand-computed D on a small census") {
    // a = {1,2,3,4}, b = {3,4,5,6}: ECDFs diverge most at v=2: 2/4 - 0
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Hypothesis.ksTest(a, b, col("v")).head()
    assert(r.getDouble(2) === 0.5)
  }

  test("D is shard-count invariant") {
    val a = (1 to 200).map(i => ((i * 13) % 40).toLong).toDF("v")
    val b = (1 to 150).map(i => ((i * 7) % 55).toLong).toDF("v")
    val d1 = Hypothesis.ksTest(a, b, col("v"), shards = 1).head().getDouble(2)
    val d7 = Hypothesis.ksTest(a, b, col("v"), shards = 7).head().getDouble(2)
    assert(d1 === d7)
  }

  test("grouped KS evaluates the gap INSIDE group-flat intervals") {
    // group a = {0, 100}; group b = {50}×100 — a's ECDF is flat on
    // (0, 100) while the baseline jumps at 50: sampling only a's own
    // rows would miss the dominant gap at v=50
    val df = (Seq(("a", 0L), ("a", 100L)) ++
      Seq.fill(100)(("b", 50L))).toDF("g", "v")
    val d = Hypothesis.ksTestByGroup(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // at v=50: F_a = 1/2, F_all = 101/102 → gap = |51 - 101|/102... in
    // integer form |cuma·N − cumb·ng|/(ng·N) = |1·102 − 101·2|/204
    assert(d("a") === math.rint(100.0 / 204 * 1e6) / 1e6)
  }

  test("grouped KS agrees with the pairwise test run slice-vs-whole") {
    val df = (1 to 90).map(i => (if (i % 3 == 0) "x" else "y",
      ((i * 17) % 23).toLong)).toDF("g", "v")
    val grouped = Hypothesis.ksTestByGroup(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val px = Hypothesis.ksTest(df.where(col("g") === "x").select("v"),
      df.select("v"), col("v")).head().getDouble(2)
    assert(grouped("x") === px)
  }

  test("BH: planted small p-values are discovered, the bulk is not") {
    val pv = ((1 to 3).map(i => (s"sig$i", i * 1000L)) ++
      (1 to 30).map(i => (s"null$i", 400000L + i * 10000L)))
      .toDF("key", "p_micro")
    val out = Hypothesis.bhCorrect(pv, alphaMicro = 50000L).collect()
    val disc = out.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    assert(disc === Set("sig1", "sig2", "sig3"))
  }

  test("BH: step-up catches borderline ranks below a later passing rank") {
    // m=4, alpha=0.5 → per-rank bars alpha·k/m = .125, .25, .375, .5
    // p = (.10 ✓, .30 ✗, .40 ✗, .90 ✗) → k* = 1 → only rank 1
    val pv = Seq(("a", 100000L), ("b", 300000L), ("c", 400000L),
      ("d", 900000L)).toDF("key", "p_micro")
    val out = Hypothesis.bhCorrect(pv, alphaMicro = 500000L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out === Map("a" -> true, "b" -> false, "c" -> false,
      "d" -> false))
    // p = (.10 ✓, .30 ✗, .35 ✓, .90 ✗) → k* = 3 sweeps rank 2 in even
    // though it failed its own bar (the step-up property)
    val pv2 = Seq(("a", 100000L), ("b", 300000L), ("c", 350000L),
      ("d", 900000L)).toDF("key", "p_micro")
    val out2 = Hypothesis.bhCorrect(pv2, alphaMicro = 500000L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out2 === Map("a" -> true, "b" -> true, "c" -> true,
      "d" -> false))
  }

  test("Mann-Whitney: hand-computed doubled midranks, ties, z and p") {
    // a = [1,2,3,3,5], b = [3,4,5,6]: doubled midranks give R2_a = 37,
    // U2_a = 7 (U_a = 3.5); tie-corrected var → z = -1.626412,
    // p = 0.103862 (matches scipy's asymptotic no-continuity path)
    val a = Seq(1L, 2L, 3L, 3L, 5L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Hypothesis.mannWhitney(a, b, col("v")).head()
    assert(r.getLong(0) === 5L && r.getLong(1) === 4L)
    assert(r.getLong(2) === 7L)
    assert(r.getDouble(3) === -1.626412)
    assert(r.getDouble(4) === 0.103862)
  }

  test("Mann-Whitney: symmetric inputs give z = 0, p = 1") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val r = Hypothesis.mannWhitney(a, a, col("v")).head()
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 1.0)
  }

  test("Mann-Whitney: all-tied values have zero variance -> null z") {
    val a = Seq(7L, 7L).toDF("v")
    val r = Hypothesis.mannWhitney(a, a, col("v")).head()
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("chi-square: hand-computed 2x2 table") {
    // [[10,20],[30,40]] → chi2 = 0.793651 (exact 200/252), df = 1,
    // Wilson-Hilferty p = 0.376715 (exact survival is 0.373; WH error
    // ~1e-2 at df = 1 is the documented contract)
    val df = (Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q")))
      .toDF("a", "b")
    val r = Hypothesis.chiSquareIndependence(df, col("a"), col("b")).head()
    assert(r.getLong(0) === 100L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 0.793651)
    assert(r.getDouble(3) === 0.376715)
  }

  test("chi-square: independent columns score ~0; absent cells count") {
    val ind = (for (i <- 0 until 60) yield (s"a${i % 2}", s"b${i % 3}"))
      .toDF("a", "b")
    val r = Hypothesis.chiSquareIndependence(ind, col("a"), col("b")).head()
    assert(r.getLong(1) === 2L && r.getDouble(2) === 0.0)
    // a category pair that never co-occurs still contributes E > 0
    val gap = Seq(("x", "p"), ("y", "q"), ("y", "p"), ("x", "p"))
      .toDF("a", "b")
    val g = Hypothesis.chiSquareIndependence(gap, col("a"), col("b")).head()
    assert(g.getDouble(2) > 0.0)
  }
}

package graft.operators

import graft.SparkSpec

class PolicyEvalSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Boolean, Long, Long)]) =
    PolicyEval.offPolicyValue(
      rows.toDF("matched", "propensity_micro", "reward_micro")).head()

  test("hand-computed IPS/SNIPS/ESS") {
    // matched rows: p=0.5 w=2, r=1.0; p=0.25 w=4, r=2.0; unmatched row
    // contributes only to n. IPS = (2*1 + 4*2)/3 = 10/3; SNIPS =
    // (2*1 + 4*2)/(2+4) = 10/6; ESS = 36/20 = 1.8
    val r = run(Seq(
      (true, 500000L, 1000000L),
      (true, 250000L, 2000000L),
      (false, 500000L, 9000000L)))
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 3.333333)
    assert(r.getDouble(3) === 1.666667)
    assert(r.getDouble(4) === 1.8)
  }

  test("uniform weights: SNIPS equals the matched mean, ESS = n_matched") {
    val r = run(Seq(
      (true, 1000000L, 3000000L), (true, 1000000L, 5000000L),
      (false, 1000000L, 100000L)))
    assert(r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 2.0)
  }

  test("no matched rows: IPS 0, SNIPS/ESS null") {
    val r = run(Seq((false, 500000L, 1000000L)))
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("contract guards fail loudly") {
    val e1 = intercept[Exception] { run(Seq((true, 0L, 1L))) }
    assert(e1.getMessage.contains("propensity_micro"))
    val e2 = intercept[Exception] { run(Seq((true, 500000L, -1L))) }
    assert(e2.getMessage.contains("reward_micro"))
  }
}

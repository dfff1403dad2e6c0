package graft.operators

import graft.SparkSpec

class ZipfSpec extends SparkSpec {

  import spark.implicits._

  /** corpus where term_k appears round(C/k^s) times — exact power law. */
  private def powerLaw(s: Double, terms: Int, c: Int) = {
    val docs = (1 to terms).flatMap { k =>
      val n = math.max(math.round(c / math.pow(k, s)).toInt, 2)
      Seq.fill(n)(s"term$k")
    }.grouped(50).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
    docs.toDF("doc_id", "text")
  }

  test("a power-law corpus recovers its exponent (slope ≈ −s)") {
    val r = Salience.zipfFit(powerLaw(1.0, 40, 4000), minCount = 2).head()
    assert(r.getLong(0) === 40L)
    assert(math.abs(r.getDouble(1) + 1.0) < 0.1,
      s"slope should be ≈ −1, got ${r.getDouble(1)}")
  }

  test("a flat (uniform-frequency) corpus fits slope ≈ 0") {
    val flat = (1 to 30).flatMap(k => Seq.fill(10)(s"w$k"))
      .grouped(40).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val r = Salience.zipfFit(flat, minCount = 2).head()
    assert(math.abs(r.getDouble(1)) < 0.05,
      s"flat corpus must fit ~0, got ${r.getDouble(1)}")
  }

  test("steeper law → steeper slope") {
    val s1 = Salience.zipfFit(powerLaw(0.7, 40, 4000), minCount = 2)
      .head().getDouble(1)
    val s2 = Salience.zipfFit(powerLaw(1.3, 40, 4000), minCount = 2)
      .head().getDouble(1)
    assert(s2 < s1, s"expected $s2 < $s1")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSpec {

  import spark.implicits._

  private def run(vs: Seq[Long]) =
    Benford.firstDigit(vs.toDF("v"), col("v"))
      .orderBy("digit").collect()

  test("expected shares are the Benford constants and sum to ~1e6") {
    assert(Benford.expectedMicro(1) === 301030L)
    assert(Benford.expectedMicro(9) === 45757L)
    val total = Benford.expectedMicro.values.sum
    assert(math.abs(total - 1000000L) <= 4, s"shares sum to $total")
  }

  test("first digit comes from the decimal string, across magnitudes") {
    // 1, 19, 123, 2000, 999 -> digits 1,1,1,2,9
    val out = run(Seq(1L, 19L, 123L, 2000L, 999L))
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(1) === 3L && byDigit(2) === 1L && byDigit(9) === 1L)
    assert(byDigit(3) === 0L, "unseen digits appear with n = 0")
    assert(out.length === 9)
  }

  test("non-positives are excluded and counted") {
    val out = run(Seq(-5L, 0L, 7L, 70L))
    assert(out.head.getLong(3) === 2L) // n_excluded
    assert(out.head.getLong(2) === 2L) // n_total
    assert(out.map(_.getLong(1)).sum === 2L)
  }

  test("a perfectly Benford-weighted sample scores ~zero chi2") {
    // counts proportional to the micro shares themselves
    val vs = (1 to 9).flatMap { d =>
      Seq.fill((Benford.expectedMicro(d) / 1000L).toInt)(d.toLong)
    }
    val chi2 = run(vs).head.getDouble(7)
    assert(chi2 < 1.0, s"chi2 $chi2 should be near zero")
    // a degenerate all-9s sample scores enormously
    val bad = run(Seq.fill(1000)(9L)).head.getDouble(7)
    assert(bad > 1000.0, s"chi2 $bad should explode")
  }
}

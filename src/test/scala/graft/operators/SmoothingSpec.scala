package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoothingSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double)], alphaMicro: Long) =
    Smoothing.ewma(rows.toDF("k", "ts", "id", "v"),
      key = col("k"), order = col("ts"), tie = col("id"), value = col("v"),
      alphaMicro = alphaMicro)

  test("hand-computed recurrence, α = 0.5") {
    val out = run(Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 4.0)),
      500000L)
      .orderBy("rn").select("rn", "ewma_micro", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // s1 = 1e6; s2 = (.5·2e6 + .5·1e6) = 1.5e6; s3 = (.5·4e6 + .5·1.5e6)
    assert(out.toSeq === Seq((1L, 1000000L, 1.0), (2L, 1500000L, 1.5),
      (3L, 2750000L, 2.75)))
  }

  test("integer div truncation is part of the contract") {
    val out = run(Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0)), 333333L)
      .orderBy("rn").select("ewma_micro").as[Long].collect()
    // (333333·2e6 + 666667·1e6) div 1e6 = 1333333 exactly
    assert(out.toSeq === Seq(1000000L, 1333333L))
  }

  test("keys are independent; ties break on the tie column") {
    val out = run(Seq(
      (1L, 5L, 2L, 4.0), (1L, 5L, 1L, 2.0), // same ts — id orders them
      (2L, 1L, 3L, 8.0)), 500000L)
    val k1 = out.where(col("key") === 1).orderBy("rn")
      .select("value_micro").as[Long].collect()
    assert(k1.toSeq === Seq(2000000L, 4000000L))
    val k2 = out.where(col("key") === 2).select("rn", "ewma_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(k2.toSeq === Seq((1L, 8000000L)))
  }

  test("one output row per input row on real events") {
    val ev = Seq((1L, 1L, 1L, 1.5), (1L, 2L, 2L, 2.5), (2L, 1L, 3L, 3.5),
      (3L, 9L, 4L, 0.0))
    assert(run(ev, 300000L).count() === ev.size.toLong)
  }

  test("negative values are rejected, not silently mis-smoothed") {
    // div truncates, the oracle's // floors — they only agree on
    // non-negatives, so the contract is enforced with raise_error
    val e = intercept[Exception] {
      run(Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, -0.5)), 500000L).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }
}

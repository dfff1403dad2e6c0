package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FairnessSpec extends SparkSpec {

  // (group, score_micro, label): group a = 2 predicted-pos of 4 (one TP,
  // one FP); group b = 1 predicted-pos of 2, no true positives at all
  private def scored = {
    import spark.implicits._
    Seq(
      ("a", 10L, true), ("a", 10L, false), ("a", -5L, true), ("a", -5L, false),
      ("b", 10L, false), ("b", -5L, false))
      .toDF("grp", "score_micro", "label")
  }

  private def row(g: String) =
    Evaluation.fairnessBy(scored, col("grp")).where(col("grp") === g)
      .collect().head

  test("per-group counts and rates") {
    val a = row("a")
    assert((a.getAs[Long]("tp"), a.getAs[Long]("fp"), a.getAs[Long]("fn"),
      a.getAs[Long]("tn")) === ((1L, 1L, 1L, 1L)))
    assert(a.getAs[Double]("pos_rate") === 0.5)
    assert(a.getAs[Double]("tpr") === 0.5)
    assert(a.getAs[Double]("fpr") === 0.5)
  }

  test("gaps are against the pooled rates") {
    // pool: pos_rate 3/6 = 0.5, tpr 1/2 = 0.5, fpr 2/4 = 0.5
    val a = row("a")
    assert(a.getAs[Double]("dp_gap") === 0.0)
    assert(a.getAs[Double]("eo_gap") === 0.0)
  }

  test("a slice with no positives has null TPR and degrades EO to the FPR gap") {
    val b = row("b")
    assert(b.isNullAt(b.fieldIndex("tpr")))
    assert(b.isNullAt(b.fieldIndex("tpr_gap")))
    assert(b.getAs[Double]("fpr") === 0.5)
    assert(b.getAs[Double]("fpr_gap") === 0.0)
    assert(b.getAs[Double]("eo_gap") === 0.0)
    assert(b.getAs[Double]("dp_gap") === 0.0)
  }

  test("a biased slice surfaces a demographic-parity gap") {
    import spark.implicits._
    val df = Seq(
      ("x", 10L, true), ("x", 10L, true), ("x", 10L, false), ("x", -1L, false),
      ("y", -1L, true), ("y", -1L, true), ("y", -1L, false), ("y", 10L, false))
      .toDF("grp", "score_micro", "label")
    val out = Evaluation.fairnessBy(df, col("grp")).collect()
      .map(r => r.getString(0) -> r).toMap
    // pool pos_rate = 4/8 = 0.5; x admits 3/4, y admits 1/4
    assert(out("x").getAs[Double]("dp_gap") === 0.25)
    assert(out("y").getAs[Double]("dp_gap") === -0.25)
    // x: tpr 1.0 (pool 0.5 -> +0.5), fpr 0.5 (pool 0.5 -> 0)
    assert(out("x").getAs[Double]("eo_gap") === 0.5)
  }
}

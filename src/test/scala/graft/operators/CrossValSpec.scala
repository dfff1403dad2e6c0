package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossValSpec extends SparkSpec {

  import spark.implicits._

  // separable fixture: positive docs speak one vocabulary, negatives
  // another, so every fold's held-out AUC must be ~1; a handful of
  // ambiguous docs keep the scores non-degenerate
  private def corpus = (0L until 120L).map { i =>
    val pos = i % 2 == 0
    val text =
      if (i % 30 == 7) "shared mixed tokens here"
      else if (pos) s"alpha beta gamma delta token$i alpha beta"
      else s"omega psi chi phi token$i omega psi"
    (i, text, pos)
  }.toDF("doc_id", "text", "label")

  test("separable classes give near-perfect held-out AUC in every fold") {
    val out = CrossVal.nbCvAuc(corpus, col("label"), folds = 4, buckets = 512)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toMap
    assert(out.keySet == (0L until 4L).toSet, out.keySet.toString)
    out.foreach { case (f, (np, nn, auc)) =>
      assert(np > 0 && nn > 0, s"fold $f degenerate: $np/$nn")
      assert(auc >= 0.9, s"fold $f auc $auc on separable classes")
    }
  }

  test("folds partition the labeled corpus; label-null docs are excluded") {
    val withNulls = corpus.withColumn("label",
      when(col("doc_id") % 10 === 9, lit(null)).otherwise(col("label")))
    val out = CrossVal.nbCvAuc(withNulls, col("label"), folds = 3, buckets = 512)
      .agg(sum(col("n_pos") + col("n_neg"))).head().getLong(0)
    val labeled = withNulls.where(col("label").isNotNull).count()
    assert(out == labeled, s"scored $out of $labeled labeled docs")
  }

  test("random labels give chance-level AUC (sanity against leakage)") {
    // deterministic pseudo-random labels INDEPENDENT of the text content
    val rand = corpus.withColumn("label",
      pmod(conv(substring(md5(concat(lit("rl:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(2L)) === 1L)
      .withColumn("text", regexp_replace(col("text"), "token\\d+", "t"))
    val aucs = CrossVal.nbCvAuc(rand, col("label"), folds = 3, buckets = 512)
      .collect().flatMap(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(aucs.nonEmpty)
    val mean = aucs.sum / aucs.length
    assert(mean > 0.2 && mean < 0.8,
      s"mean held-out AUC $mean on label-independent text suggests leakage")
  }
}

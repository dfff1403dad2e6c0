package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {

  import spark.implicits._

  private def scored(rows: Seq[(Long, Boolean)]) =
    rows.zipWithIndex
      .map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("doc_id", "score_micro", "label")

  test("AUC: perfect separation = 1, inverted = 0, single score = 0.5") {
    val perfect = scored(Seq((10L, true), (9L, true), (1L, false), (0L, false)))
    assert(Evaluation.rocAuc(perfect).head().getDouble(2) === 1.0)
    val inverted = scored(Seq((10L, false), (9L, false), (1L, true), (0L, true)))
    assert(Evaluation.rocAuc(inverted).head().getDouble(2) === 0.0)
    val flat = scored(Seq((5L, true), (5L, false), (5L, true), (5L, false)))
    assert(Evaluation.rocAuc(flat).head().getDouble(2) === 0.5)
  }

  test("AUC equals brute-force pair counting with half-credit ties") {
    val rows = (0 until 60).map { i =>
      (((i * 37) % 13).toLong, (i * 31) % 7 < 3)
    }
    val brute = {
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val credit = (for (p <- pos; n <- neg) yield {
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0
      }).sum
      math.rint(credit / (pos.size * neg.size) * 1e6) / 1e6
    }
    val got = Evaluation.rocAuc(scored(rows)).head()
    assert(got.getLong(0) === rows.count(_._2).toLong)
    assert(got.getDouble(2) === brute)
  }

  test("AUC is null when a class is empty") {
    val onlyPos = scored(Seq((3L, true), (1L, true)))
    assert(Evaluation.rocAuc(onlyPos).head().isNullAt(2))
  }

  test("average precision: hand-computed with a tie level") {
    // desc levels: s=3 (1 pos), s=2 (1 pos + 1 neg tie), s=1 (1 neg)
    // prec after level: 1/1, 2/3, 2/4 ; AP = (1·1 + 1·2/3)/2
    val df = scored(Seq((3L, true), (2L, true), (2L, false), (1L, false)))
    val ap = Evaluation.averagePrecision(df).head().getDouble(2)
    assert(ap === math.rint((1.0 + 2.0 / 3.0) / 2 * 1e6) / 1e6)
  }

  test("calibration bins clamp and gap is |obs - pred| in micro") {
    // one bin at the +8 clamp: score 9.5 log10-odds → pred ≈ 1.0
    val df = scored(Seq((9500000L, true), (9500000L, true)))
    val r = Evaluation.calibration(df).head()
    assert(r.getLong(0) === 8L) // clamped bin
    assert(r.getLong(3) === 1000000L) // obs = 100%
    assert(r.getLong(4) === 1000000L) // logistic(9.5) rounds to 1.0
    assert(r.getLong(5) === 0L)
    // zero-log-odds bin: pred = 0.5 exactly, obs = 0 → gap 500000
    val r0 = Evaluation.calibration(scored(Seq((0L, false)))).head()
    assert(r0.getLong(4) === 500000L && r0.getLong(5) === 500000L)
  }

  test("ECE folds bin gaps weighted by bin mass") {
    // two bins: bin 0 (s=0, neg: gap 500000, n=1),
    //           bin 8 (s=9.5M ×2 pos: gap 0, n=2)
    val df = scored(Seq((0L, false), (9500000L, true), (9500000L, true)))
    val r = Evaluation.calibrationError(df).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === math.rint(500000.0 / 3 / 1e6 * 1e6) / 1e6)
  }

  test("confusion matrix and derived rates at threshold 0") {
    val df = scored(Seq(
      (5L, true), (5L, true), (3L, false), // tp tp fp
      (0L, true), (-2L, false), (-9L, false))) // fn tn tn
    val r = Evaluation.confusionAt(df).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(4) === math.rint(2.0 / 3 * 1e6) / 1e6) // precision
    assert(r.getDouble(5) === math.rint(2.0 / 3 * 1e6) / 1e6) // recall
    assert(r.getDouble(6) === math.rint(4.0 / 6 * 1e6) / 1e6) // f1
    assert(r.getDouble(7) === math.rint(4.0 / 6 * 1e6) / 1e6) // accuracy
  }

  test("per-slice AUC matches the global computation per group") {
    val rows = (0 until 80).map { i =>
      (if (i % 2 == 0) "g1" else "g2", ((i * 37) % 13).toLong,
        (i * 31) % 7 < 3)
    }
    val df = rows.zipWithIndex.map { case ((g, s, l), i) =>
      (i.toLong, g, s, l)
    }.toDF("doc_id", "grp", "score_micro", "label")
    val by = Evaluation.rocAucBy(df, col("grp")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    Seq("g1", "g2").foreach { g =>
      val solo = Evaluation.rocAuc(df.where(col("grp") === g))
        .head().getDouble(2)
      assert(by(g) === solo, s"slice $g")
    }
    // single-class slice → null
    val mono = Seq((1L, "m", 5L, true), (2L, "m", 3L, true))
      .toDF("doc_id", "grp", "score_micro", "label")
    assert(Evaluation.rocAucBy(mono, col("grp")).head().isNullAt(3))
  }

  test("precision-threshold solver picks the lowest qualifying bar") {
    // scores desc: 10(+) 9(+) 8(−) 7(+) 6(−) 5(−)
    // θ=7: tp 3 fp 1 → 0.75; θ=9: tp 2 fp 0 → 1.0
    val df = scored(Seq((10L, true), (9L, true), (8L, false), (7L, true),
      (6L, false), (5L, false)))
    val out = Evaluation.thresholdForPrecision(df,
        targetsMicro = Seq(700000L, 900000L, 1000000L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(700000L) === ((7L, 3L, 1L))) // max recall at ≥0.7
    assert(out(900000L) === ((9L, 2L, 0L)))
    assert(out(1000000L) === ((9L, 2L, 0L)))
    // an unreachable target on all-negative data → null row
    val neg = scored(Seq((5L, false), (3L, false)))
    val r = Evaluation.thresholdForPrecision(neg,
      targetsMicro = Seq(500000L)).head()
    assert(r.isNullAt(1))
  }

  test("two-phase cumulative is shard-count invariant") {
    val rows = (0 until 200).map(i => (((i * 17) % 29).toLong, i % 3 == 0))
    val df = scored(rows)
    val a = Evaluation.rocAuc(df, shards = 1).head().getDouble(2)
    val b = Evaluation.rocAuc(df, shards = 7).head().getDouble(2)
    val c = Evaluation.averagePrecision(df, shards = 1).head().getDouble(2)
    val d = Evaluation.averagePrecision(df, shards = 7).head().getDouble(2)
    assert(a === b && c === d)
  }

  private def isoOf(rows: Seq[(Long, Boolean)]): Seq[(Long, Long)] =
    Evaluation.isotonicCalibration(scored(rows))
      .orderBy("bin").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toSeq

  test("isotonic: textbook violator pooling") {
    // bins 0,1,2 (scores 0.x, 1.x, 2.x micro-bins won't trigger... use
    // scores in units of 1e6): rates 1/2, 0/2, 2/2 — bins 0 and 1
    // violate and pool to 1/4; bin 2 stays 1.0
    val rows = Seq(
      (100000L, true), (200000L, false),       // bin 0: 1/2
      (1100000L, false), (1200000L, false),    // bin 1: 0/2
      (2100000L, true), (2200000L, true))      // bin 2: 2/2
    assert(isoOf(rows) === Seq(0L -> 250000L, 1L -> 250000L, 2L -> 1000000L))
  }

  test("isotonic: already-monotone rates pass through untouched") {
    val rows = Seq(
      (100000L, false), (200000L, false),      // bin 0: 0/2
      (1100000L, true), (1200000L, false),     // bin 1: 1/2
      (2100000L, true), (2200000L, true))      // bin 2: 2/2
    assert(isoOf(rows) === Seq(0L -> 0L, 1L -> 500000L, 2L -> 1000000L))
  }

  test("isotonic: cascading merge collapses a long decreasing run") {
    val rows = Seq(
      (100000L, true),                          // bin 0: 1/1
      (1100000L, true), (1200000L, false),      // bin 1: 1/2 — violates 0
      (2100000L, false), (2200000L, false))     // bin 2: 0/2 — cascades
    // all pool: 2/5 = 0.4
    assert(isoOf(rows) === Seq(0L -> 400000L, 1L -> 400000L, 2L -> 400000L))
    // and the output is globally monotone on the NB fixture shape
    val mixed = (0 until 300).map(i =>
      (((i * 37) % 13 - 6).toLong * 1000000L + i % 7, (i * 31) % 5 < 2))
    val iso = isoOf(mixed).map(_._2)
    assert(iso === iso.sorted, "iso_micro must be non-decreasing in bin")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactKthSpec extends SparkSpec {

  import spark.implicits._

  test("exact selection over a wide range needing multiple rounds") {
    // values spread over ~2^40 — forces at least 2 narrowing rounds
    val vals = (1 to 500).map(i => i.toLong * 2199023255L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (k <- Seq(1, 250, 251, 500)) {
      val r = HistQuantile.exactKth(df, col("v"), k.toLong).head()
      assert(r.getLong(2) === sorted(k - 1), s"k=$k")
    }
  }

  test("duplicates and negatives resolve to the correct order statistic") {
    val vals = Seq(-5L, -5L, -5L, 0L, 3L, 3L, 7L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    (1 to vals.size).foreach { k =>
      assert(HistQuantile.exactKth(df, col("v"), k.toLong)
        .head().getLong(2) === sorted(k - 1), s"k=$k")
    }
  }

  test("nulls are excluded and ranks validate") {
    val df = Seq(Some(10L), None, Some(20L)).toDF("v")
    val r = HistQuantile.exactKth(df, col("v"), 2L).head()
    assert(r.getLong(0) === 2L && r.getLong(2) === 20L)
    intercept[IllegalArgumentException] {
      HistQuantile.exactKth(df, col("v"), 3L)
    }
  }

  test("full 64-bit domain: hi - lo overflows a long, sign-split handles it") {
    // Long.MinValue..Long.MaxValue — the range arithmetic would overflow
    // and double-division bucketing would misbucket; both fixed paths
    // must agree with the plain sort on every rank
    val vals = Seq(Long.MinValue, Long.MinValue + 7L, -3L, 0L, 5L,
      (1L << 62) + 11L, Long.MaxValue - 1L, Long.MaxValue)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    (1 to vals.size).foreach { k =>
      assert(HistQuantile.exactKth(df, col("v"), k.toLong)
        .head().getLong(2) === sorted(k - 1), s"k=$k")
    }
  }

  test("values spanning > 2^53 within one narrowing round stay exact") {
    // adjacent values around a bucket boundary in a > 2^53 range: the
    // old double-division bucket index rounds these into the wrong cell
    val base = 1L << 60
    val vals = Seq(-base, -base + 1L, base - 1L, base, base + 1L, 0L, 1L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    (1 to vals.size).foreach { k =>
      assert(HistQuantile.exactKth(df, col("v"), k.toLong)
        .head().getLong(2) === sorted(k - 1), s"k=$k")
    }
  }

  test("moment censuses merge to the whole-corpus census") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(i * 0.1, 1.0 - i * 0.01, 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val whole = Pca.momentsMicro(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.toSeq).toMap
    val merged = Pca.mergeMoments(
        Pca.momentsMicro(df.where(col("vec_id") % 2 === 0)),
        Pca.momentsMicro(df.where(col("vec_id") % 2 === 1)))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.toSeq).toMap
    assert(merged === whole)
  }
}

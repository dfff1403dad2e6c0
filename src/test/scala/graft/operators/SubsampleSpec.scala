package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubsampleSpec extends SparkSpec {

  import spark.implicits._

  test("rare tokens always survive (p clamps to 1)") {
    // 'rare' appears once in 2000 tokens: f = 5e-4 < t=1e-3 → p = 1
    val common = Seq.fill(1999)("the").mkString(" ")
    val df = Seq((1L, s"$common rare")).toDF("doc_id", "text")
    val r = Subsample.frequencySubsample(df, t = 1e-3).head()
    assert(r.getLong(1) === 2000L)
    assert(r.getString(3).split(" ").contains("rare"))
  }

  test("ubiquitous tokens are thinned near the expected rate") {
    // single token type: f = 1 → p = √t + t ≈ 0.0326
    val df = Seq((1L, Seq.fill(3000)("the").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Subsample.frequencySubsample(df, t = 1e-3).head()
    val kept = r.getLong(2)
    assert(kept > 40 && kept < 220, s"kept $kept of 3000, expected ~98")
  }

  test("reassembly preserves position order and empty survivors give ''") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = Subsample.frequencySubsample(df, t = 100.0).head()
    // t huge → p = 1 for everything: full text back in order
    assert(r.getString(3) === "a b c d e f g h")
    val none = Subsample.frequencySubsample(df, t = 1e-12).head()
    assert(none.getLong(2) <= 1L) // p ≈ 1e-6: essentially nothing kept
    if (none.getLong(2) === 0L) assert(none.getString(3) === "")
  }

  test("decisions are per-occurrence deterministic and seed-sensitive") {
    val df = Seq((1L, Seq.fill(500)("x").mkString(" "))).toDF("doc_id", "text")
    val a = Subsample.frequencySubsample(df, t = 1e-2).head().getLong(2)
    val b = Subsample.frequencySubsample(df, t = 1e-2).head().getLong(2)
    val c = Subsample.frequencySubsample(df, t = 1e-2, seed = 7L)
      .head().getLong(2)
    assert(a === b)
    assert(a !== c, "different seed must redraw")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import RecordLinkage.FsField

class RecordLinkageSpec extends SparkSpec {

  import spark.implicits._

  private val fields = Seq(
    FsField("lang", col("lang_a") === col("lang_b"), 0.95, 0.2),
    FsField("src", col("src_a") === col("src_b"), 0.9, 0.1))

  test("micro-bit weights match hand-computed log2 ratios") {
    val f = fields.head
    assert(f.agreeMicro === math.round(math.log(0.95 / 0.2) / math.log(2) * 1e6))
    assert(f.disagreeMicro < 0, "disagreement must penalize")
    assert(f.disagreeMicro ===
      math.round(math.log(0.05 / 0.8) / math.log(2) * 1e6))
  }

  test("score sums the per-field constants; classify is three-way") {
    val pairs = Seq(
      (1L, 2L, "en", "en", "a", "a"), // both agree → strong link
      (1L, 3L, "en", "de", "a", "a"), // lang disagrees
      (1L, 4L, "en", "de", "a", "b")  // both disagree → nonlink
    ).toDF("doc_a", "doc_b", "lang_a", "lang_b", "src_a", "src_b")
    val out = RecordLinkage.classify(
        RecordLinkage.score(pairs, fields), upperMicro = 2000000L,
        lowerMicro = 0L)
      .orderBy("doc_b").collect()
    val both = fields.map(_.agreeMicro).sum
    assert(out(0).getAs[Long]("fs_micro") === both)
    assert(out(0).getAs[String]("verdict") === "link")
    assert(out(1).getAs[Long]("fs_micro") ===
      fields(0).disagreeMicro + fields(1).agreeMicro)
    assert(out(2).getAs[String]("verdict") === "nonlink")
  }

  test("uEstimate: uniform 4-value field gives u = 0.25") {
    val df = (0 until 400).map(i => Tuple1(s"v${i % 4}")).toDF("f")
    val u = RecordLinkage.uEstimate(df, Map("f" -> col("f"))).head()
    assert(u.getString(0) === "f")
    assert(u.getLong(1) === 250000L)
  }

  test("uEstimate: skewed field raises u") {
    val df = (Seq.fill(90)("x") ++ Seq.fill(10)("y")).map(Tuple1(_)).toDF("f")
    val u = RecordLinkage.uEstimate(df, Map("f" -> col("f"))).head().getLong(1)
    assert(u === 820000L) // 0.9² + 0.1²
  }

  test("FsField rejects degenerate probabilities") {
    intercept[IllegalArgumentException] {
      FsField("bad", lit(true), 0.2, 0.5)
    }
  }
}

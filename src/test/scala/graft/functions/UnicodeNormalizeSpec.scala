package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // all Unicode via compile-time escapes, never raw chars — a tool that
  // NFC-normalizes source files must not be able to vacuate these tests
  private val eAcuteDecomposed = "e\u0301"
  private val eAcuteComposed = "\u00e9"
  private val aRingDecomposed = "A\u030a"
  private val aRingComposed = "\u00c5"
  private val fiLigature = "\ufb01"        // folds only under NFKC
  private val fullwidthOne = "\uff11"

  private def one(text: String, c: org.apache.spark.sql.Column): String =
    Seq(text).toDF("t").select(c.as("r")).head().getString(0)

  test("NFC composes combining sequences; NFKC also folds compatibility forms") {
    val decomposed = s"$eAcuteDecomposed $aRingDecomposed"
    assert(one(decomposed, UnicodeNormalize.nfc(col("t"))) ==
      s"$eAcuteComposed $aRingComposed")
    val compat = s"${fiLigature}le $fullwidthOne"
    assert(one(compat, UnicodeNormalize.nfc(col("t"))) == compat,
      "NFC must preserve compatibility forms")
    assert(one(compat, UnicodeNormalize.nfkc(col("t"))) == "file 1")
    assert(one("plain ascii", UnicodeNormalize.nfc(col("t"))) == "plain ascii")
  }

  test("nulls pass through; wrong input type fails analysis") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(UnicodeNormalize.nfc(col("t"))).head()
    assert(r.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("t").select(UnicodeNormalize.nfc(col("t"))).collect()
    }
  }

  test("SQL surface: unicode_norm default NFC, explicit lowercase form") {
    graft.session.GraftFunctions.register(spark)
    Seq(eAcuteDecomposed).toDF("t").createOrReplaceTempView("un_t")
    assert(spark.sql("SELECT unicode_norm(t) FROM un_t")
      .head().getString(0) == eAcuteComposed)
    assert(spark.sql(s"SELECT unicode_norm('$fiLigature', 'nfkc') FROM un_t")
      .head().getString(0) == "fi")
  }
}

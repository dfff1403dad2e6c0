package graft.operators

import graft.SparkSpec

class SpanCorruptSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = (1L to 40L)
    .map(i => (i, (1 to 50).map(j => s"w${(i * 7 + j) % 90}").mkString(" ")))
    .toDF("doc_id", "text")

  test("deterministic in the seed; different seeds differ") {
    def run(seed: Long) = SpanCorrupt.corrupt(corpus, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(1L) === run(1L))
    assert(run(1L) !== run(2L))
  }

  test("masked rate lands near 2·startProb; spans have mean length ≈ 2") {
    val agg = SpanCorrupt.corrupt(corpus, startProbMicro = 75000L)
      .agg(org.apache.spark.sql.functions.sum("n_tokens"),
        org.apache.spark.sql.functions.sum("n_masked"),
        org.apache.spark.sql.functions.sum("n_spans")).head()
    val (nt, nm, ns) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val rate = nm.toDouble / nt
    assert(rate > 0.08 && rate < 0.22, s"corruption rate off: $rate")
    val meanLen = nm.toDouble / ns
    assert(meanLen > 1.5 && meanLen < 2.5, s"mean span length off: $meanLen")
  }

  test("round trip: input sentinels + target spans reconstruct the text") {
    val rows = SpanCorrupt.corrupt(corpus).collect()
    rows.foreach { r =>
      val input = r.getString(1).split(" ").toSeq
      val target = r.getString(2)
      // parse target back into k -> span tokens
      val spans = scala.collection.mutable.Map[Int, Vector[String]]()
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Vector()
        } else if (cur >= 0) spans(cur) :+= t
      }
      val rebuilt = input.flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }
      val original = TextAnalysisTestAccess.normTokens(spark, corpus,
        r.getLong(0))
      assert(rebuilt === original, s"doc ${r.getLong(0)} failed round trip")
    }
  }

  test("sentinel indices are contiguous 0..n_spans-1 in order") {
    SpanCorrupt.corrupt(corpus).collect().foreach { r =>
      val ids = "<extra_id_([0-9]+)>".r
        .findAllMatchIn(r.getString(1)).map(_.group(1).toInt).toSeq
      assert(ids === (0 until r.getLong(5).toInt))
    }
  }
}

/** tiny helper: the normalized token sequence of one doc. */
object TextAnalysisTestAccess {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  def normTokens(spark: SparkSession, docs: DataFrame, id: Long): Seq[String] =
    docs.where(col("doc_id") === id)
      .select(TextAnalysis.tokens(TextAnalysis.normalized(col("text"))))
      .head().getSeq[String](0)
}

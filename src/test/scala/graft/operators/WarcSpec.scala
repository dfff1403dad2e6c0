package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.US_ASCII

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello warc world"),
    (2L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("round trip: two records per doc, fields recovered from bytes") {
    val recs = Warc.parseRecords(Warc.syntheticWarcMedia(docs))
      .orderBy("media_id", "rec_idx").collect()
    assert(recs.length == 4)
    val r0 = recs(0)
    assert(r0.getInt(1) == 0 && r0.getString(2) == "warcinfo"
      && r0.isNullAt(3) && r0.getLong(4) == 21L)
    val r1 = recs(1)
    assert(r1.getString(2) == "resource"
      && r1.getString(3) == "http://example.com/doc/1"
      && r1.getLong(4) == 16L
      && new String(r1.getAs[Array[Byte]](5), "UTF-8") == "hello warc world")
    // null text → empty resource body, record still present
    assert(recs(3).getLong(4) == 0L)
  }

  test("malformed blobs yield parsed-so-far, never an exception") {
    assert(Warc.walk(null).isEmpty)
    assert(Warc.walk("GZIP garbage".getBytes(US_ASCII)).isEmpty)
    // valid first record, then a truncated second one
    val good = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    val bad = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999\r\n\r\nxx"
    val recs = Warc.walk((good + bad).getBytes(US_ASCII))
    assert(recs.length == 1 && new String(recs.head._5, "UTF-8") == "ok")
    // missing Content-Length stops the walk
    assert(Warc.walk("WARC/1.0\r\nWARC-Type: x\r\n\r\nbody".getBytes(US_ASCII)).isEmpty)
  }

  test("back-to-back records from different sources parse as one stream") {
    val twoBlobs = Warc.syntheticWarcMedia(docs)
      .agg(collect_list(struct($"media_id", $"payload")).as("l"))
      .select(explode($"l").as("s")) // not used further; just sanity on plan
    assert(twoBlobs.count() == 2)
    val concat = Warc.walk(
      ("WARC/1.0\r\nContent-Length: 1\r\nWARC-Type: a\r\n\r\nx\r\n\r\n" +
        "WARC/1.0\r\nContent-Length: 1\r\nWARC-Type: b\r\n\r\ny\r\n\r\n").getBytes(US_ASCII))
    assert(concat.map(_._2) == Seq("a", "b"))
    assert(concat.map(r => new String(r._5, "UTF-8")) == Seq("x", "y"))
  }
}

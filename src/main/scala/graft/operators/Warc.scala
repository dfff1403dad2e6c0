package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** WARC (ISO 28500) record parsing over a binary column — the container
  * format Common Crawl ships, i.e. THE ingestion format of a web-scale
  * LLM corpus. Beyond-reference surface (SURVEY §2.13), following the
  * [[Multimodal]] real-codec pattern: a deterministic synthetic
  * generator exercises a genuine byte-level parser, so the oracle can
  * replay the generation→parse round trip from the documents table
  * alone while the parser actually walks the container.
  *
  * Parser contract: records are back-to-back `WARC/1.0` blocks —
  * `Key: Value` headers, a CRLFCRLF separator, `Content-Length` payload
  * bytes, and a CRLFCRLF terminator. Malformed input (bad magic,
  * missing Content-Length, truncated payload) yields the records parsed
  * so far, never an exception — a 100 TB crawl always contains broken
  * blobs, and one of them must not kill the stage.
  *
  * 100 TB shape: one mapPartitions pass, records stream out of each
  * blob without collecting the partition; downstream is ordinary
  * columnar work (the body column feeds [[TextAnalysis.stripMarkup]] →
  * the quality/dedup pipeline).
  */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("rec_idx", IntegerType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType),
    StructField("body", BinaryType)))

  /** The warcinfo body every synthetic blob carries (content-length 21,
    * including the trailing CRLF).
    */
  val WarcinfoBody: String = "software: graft/0.4\r\n"

  /** Two real WARC records per document — a `warcinfo` prologue and a
    * `resource` record whose body is the document text (UTF-8) and
    * whose target URI derives from the id. Deterministic, so the
    * `s5_warc_source` oracle predicts every parsed field from the
    * documents table.
    */
  def syntheticWarcMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    docs.select(col("doc_id").as("media_id"),
        coalesce(col("text"), lit("")).as("t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val body = r.getString(1).getBytes(UTF_8)
          val info = WarcinfoBody.getBytes(US_ASCII)
          def record(headers: String, payload: Array[Byte]): Array[Byte] =
            (s"WARC/1.0\r\n$headers" +
              s"Content-Length: ${payload.length}\r\n\r\n").getBytes(US_ASCII) ++
              payload ++ "\r\n\r\n".getBytes(US_ASCII)
          val payload =
            record(s"WARC-Type: warcinfo\r\nWARC-Record-ID: <urn:graft:$id>\r\n", info) ++
            record("WARC-Type: resource\r\n" +
              s"WARC-Target-URI: http://example.com/doc/$id\r\n", body)
          Row(id, payload, Row("text", "warc", null, null, null))
        }
      }(enc)
  }

  /** Walk one blob's records; total function of the bytes. */
  private[operators] def walk(payload: Array[Byte]): Seq[(Int, String, String, Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Array[Byte])]()
    if (payload == null) return out.toSeq
    var p = 0
    var idx = 0
    def indexOfCrlfCrlf(from: Int): Int = {
      var i = from
      while (i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    val magic = "WARC/".getBytes(US_ASCII)
    while (p + magic.length <= payload.length) {
      if (!magic.indices.forall(i => payload(p + i) == magic(i))) return out.toSeq
      val hdrEnd = indexOfCrlfCrlf(p)
      if (hdrEnd < 0) return out.toSeq
      val headers = new String(payload, p, hdrEnd - p, US_ASCII)
        .split("\r\n").drop(1) // drop the version line
        .flatMap { line =>
          val c = line.indexOf(':')
          if (c < 0) None else Some(line.take(c).trim -> line.drop(c + 1).trim)
        }.toMap
      val len = headers.get("Content-Length").flatMap(_.toLongOption).getOrElse(-1L)
      val bodyStart = hdrEnd + 4
      if (len < 0 || bodyStart + len > payload.length) return out.toSeq
      val body = java.util.Arrays.copyOfRange(payload, bodyStart, (bodyStart + len).toInt)
      out += ((idx, headers.getOrElse("WARC-Type", null),
        headers.getOrElse("WARC-Target-URI", null), len, body))
      idx += 1
      p = (bodyStart + len).toInt + 4 // skip the CRLFCRLF terminator
    }
    out.toSeq
  }

  /** (media_id, rec_idx, warc_type, target_uri, content_length, body):
    * every record of every blob, streamed.
    */
  def parseRecords(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(recordSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          walk(r.getAs[Array[Byte]](1)).map { case (i, t, u, l, b) =>
            Row(id, i, t, u, l, b)
          }
        }
      }(enc)
  }
}

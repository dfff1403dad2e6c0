package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns beside a typed metadata struct; decode/feature steps
  * run as partition-local batch functions (`mapPartitions` — the Scala
  * analog of arrow-batched UDFs) so heavy native decoders amortize per
  * partition, not per row.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[FakeDecoder]] is a clearly-marked deterministic stand-in
  * with the real signature — swap in a codec-backed implementation without
  * touching the Spark plumbing (schema, partitioning, batching are real
  * and tested).
  */
object Multimodal {

  /** Typed media metadata carried beside the opaque payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // "png", "wav", ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)
  ))

  /** Decoder contract: payload bytes → fixed-length feature vector.
    * Real implementations wrap a codec (JNI/FFI) initialized once per
    * partition in [[decodeFeatures]].
    */
  trait Decoder extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB: deterministic fake decode — byte histogram folded to `dim`
    * buckets, normalized. Stands in for image decode + pooling; same
    * shape/contract as a real decoder.
    */
  object FakeDecoder extends Decoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc((payload(i) & 0xff) % dim) += 1f
        i += 1
      }
      val n = math.max(1, payload.length).toFloat
      acc.map(_ / n)
    }
  }

  /** Build a media frame from the documents table: payload = utf-8 bytes
    * of the text (deterministic fake "image"), metadata derived from
    * lengths. Exercises the real binary-column path end to end.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image").as("media_type"),
        lit("fake").as("format"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Partition-batched decode → (media_id, width, height, feature vector).
    * The decoder is instantiated once per partition (amortized init), rows
    * stream through without collecting the partition.
    */
  def decodeFeatures(media: DataFrame, dim: Int = 16,
                     decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload", "meta.width", "meta.height")
      .mapPartitions { rows =>
        // per-partition decoder init happens here in a real codec impl
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // null payload/meta rows pass through as nulls — one bad row
          // must not kill a partition-long decode batch
          Row(r.getLong(0),
            if (r.isNullAt(2)) null else r.getInt(2),
            if (r.isNullAt(3)) null else r.getInt(3),
            if (payload == null) null else decoder.features(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Frame-sampling stub for video-like payloads: chunk the payload into
    * `frames` windows and emit one row per sampled frame (every `stride`).
    * Real impl: keyframe extraction; plumbing (explode to frame grain,
    * ordered frame_no) is the tested part.
    */
  def sampleFrames(media: DataFrame, frames: Int = 8, stride: Int = 2): DataFrame =
    media
      .withColumn("frame_no", explode(sequence(lit(0), lit(frames - 1), lit(stride))))
      .withColumn("frame_payload",
        expr(s"substring(payload, frame_no * (length(payload) DIV $frames) + 1, " +
          s"length(payload) DIV $frames)"))
      .select("media_id", "frame_no", "frame_payload")
}

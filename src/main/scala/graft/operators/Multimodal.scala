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
  * Decoders come in two tiers:
  *
  *  - [[PpmDecoder]] / [[WavDecoder]]: REAL pure-JVM parsers for two
  *    trivial containers (binary PPM "P6" images, RIFF/WAVE 8-bit PCM
  *    audio) — the payload's own header is the source of truth for
  *    width/height, and features are computed from the decoded samples.
  *    These exercise the whole column pipeline on real bytes with no
  *    external codec.
  *  - [[FakeDecoder]]: clearly-marked deterministic stand-in for formats
  *    whose codecs aren't available offline (jpeg/mp3/...); same
  *    signature — swap in a codec-backed implementation without touching
  *    the Spark plumbing (schema, partitioning, batching are real and
  *    tested).
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

  /** Full decode result: dimensions recovered from the payload ITSELF
    * (null when the format doesn't carry them in-band) + feature vector.
    */
  final case class Decoded(width: java.lang.Integer,
                           height: java.lang.Integer,
                           features: Array[Float])

  /** Decoder contract: payload bytes → fixed-length feature vector.
    * Real implementations wrap a codec (JNI/FFI) initialized once per
    * partition in [[decodeFeatures]].
    */
  trait Decoder extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
    /** Format-aware decoders override to recover width/height from the
      * payload header; the default reports no in-band dimensions.
      */
    def decode(payload: Array[Byte], dim: Int): Decoded =
      Decoded(null, null, features(payload, dim))
    /** Raster access for image decoders: (width, height, rgb bytes,
      * offset into the byte array) with pixels row-major, 3 bytes each —
      * the shared contract [[averageHash]] and [[resizeImage]] consume.
      * Non-image decoders report None (as does any malformed payload).
      */
    def raster(payload: Array[Byte]): Option[(Int, Int, Array[Byte], Int)] = None
  }

  /** Shared feature kernel for the real decoders: round-robin bucket
    * means of the decoded 8-bit samples, normalized to [0, 1]. Bucket b
    * averages samples at indices ≡ b (mod dim) — double accumulation,
    * float result, so an external replay (integer sum ÷ count ÷ 255,
    * cast to float32) reproduces it bit-for-bit.
    */
  private def bucketMeans(samples: Array[Byte], off: Int, len: Int,
                          dim: Int): Array[Float] = {
    val sum = new Array[Long](dim)
    val cnt = new Array[Long](dim)
    var i = 0
    while (i < len) {
      val b = i % dim
      sum(b) += (samples(off + i) & 0xff)
      cnt(b) += 1
      i += 1
    }
    Array.tabulate(dim)(b =>
      if (cnt(b) == 0) 0f else (sum(b).toDouble / cnt(b) / 255.0d).toFloat)
  }

  /** REAL decoder for binary PPM ("P6") images — pure JVM, no codec deps.
    * Parses the ASCII header (magic, width, height, maxval; '#' comments
    * allowed per spec), then computes [[bucketMeans]] over the RGB bytes.
    * Malformed payloads decode to null dimensions + empty features rather
    * than throwing — one bad file must not kill a partition batch.
    */
  object PpmDecoder extends Decoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decode(payload, dim).features

    /** (width, height, raster offset), or None on any malformed input —
      * the shared header parse [[decode]] and [[resizePpm]] build on.
      */
    private[operators] def parseRaster(payload: Array[Byte]): Option[(Int, Int, Int)] =
      try {
        require(payload.length > 2 && payload(0) == 'P' && payload(1) == '6')
        var pos = 2
        // header tokens are whitespace-separated ASCII ints; '#' starts a
        // comment running to end of line
        def nextInt(): Int = {
          while ({
            while (pos < payload.length && Character.isWhitespace(payload(pos))) pos += 1
            if (pos < payload.length && payload(pos) == '#') {
              while (pos < payload.length && payload(pos) != '\n') pos += 1
              true
            } else false
          }) ()
          var v = 0
          require(pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9')
          while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
            v = v * 10 + (payload(pos) - '0'); pos += 1
          }
          v
        }
        val w = nextInt(); val h = nextInt(); val maxval = nextInt()
        require(maxval == 255, s"only 8-bit PPM supported, maxval=$maxval")
        require(w > 0 && h > 0, s"degenerate dimensions ${w}x$h")
        pos += 1 // exactly ONE whitespace byte separates header from raster
        // raster size in LONG: a crafted huge header would overflow
        // w*h*3 to a small/negative Int and slip past this check, then
        // index out of bounds in every consumer
        require(payload.length.toLong - pos >= w.toLong * h * 3, "truncated raster")
        Some((w, h, pos))
      } catch { case _: Throwable => None }

    override def decode(payload: Array[Byte], dim: Int): Decoded =
      parseRaster(payload) match {
        case Some((w, h, off)) =>
          Decoded(w, h, bucketMeans(payload, off, w * h * 3, dim))
        case None => Decoded(null, null, Array.empty[Float])
      }

    override def raster(payload: Array[Byte]): Option[(Int, Int, Array[Byte], Int)] =
      parseRaster(payload).map { case (w, h, off) => (w, h, payload, off) }
  }

  /** REAL decoder for the formats a crawl actually contains — PNG, JPEG,
    * BMP, GIF — via the JDK's own `javax.imageio` (ships in every JRE,
    * zero external deps, works headless). Pixels are read back through
    * `BufferedImage.getRGB` row-major into the same 3-bytes-per-pixel
    * raster layout [[PpmDecoder]] produces, so every raster consumer
    * ([[bucketMeans]] features, [[averageHash]], [[resizeImage]]) works
    * unchanged on real codec output. For lossless formats (PNG/BMP/GIF)
    * the decoded raster equals the encoded one byte-for-byte, which is
    * what lets the `m_decode_png` gate predict features from the
    * generator formulas; JPEG decodes are codec-defined and are covered
    * by round-trip unit tests rather than value-pinned oracles.
    * Malformed/unrecognized payloads decode to nulls, never throw.
    */
  object ImageIoDecoder extends Decoder {
    // ImageIO's default stream cache writes temp FILES per decode — a
    // disk hazard at a million images per executor; decode in memory
    javax.imageio.ImageIO.setUseCache(false)

    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decode(payload, dim).features

    override def raster(payload: Array[Byte]): Option[(Int, Int, Array[Byte], Int)] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None  // no registered reader recognized the bytes
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h * 3)
          var y = 0
          var i = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y) // sRGB regardless of storage model
              out(i) = ((rgb >> 16) & 0xff).toByte
              out(i + 1) = ((rgb >> 8) & 0xff).toByte
              out(i + 2) = (rgb & 0xff).toByte
              i += 3
              x += 1
            }
            y += 1
          }
          Some((w, h, out, 0))
        }
      } catch { case _: Throwable => None }

    override def decode(payload: Array[Byte], dim: Int): Decoded =
      raster(payload) match {
        case Some((w, h, bytes, off)) =>
          Decoded(w, h, bucketMeans(bytes, off, w * h * 3, dim))
        case None => Decoded(null, null, Array.empty[Float])
      }
  }

  /** REAL decoder for RIFF/WAVE 8-bit PCM audio — pure JVM. Walks the
    * chunk list to "fmt " (sample rate, channels, bits) and "data",
    * computes [[bucketMeans]] over the PCM bytes. Width reports the
    * sample rate and height the channel count (the schema's closest
    * analogs); malformed payloads decode to nulls, not exceptions.
    */
  object WavDecoder extends Decoder {
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    def features(payload: Array[Byte], dim: Int): Array[Float] =
      decode(payload, dim).features

    override def decode(payload: Array[Byte], dim: Int): Decoded = {
      try {
        require(payload.length >= 44 &&
          new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
          new String(payload, 8, 4, "US-ASCII") == "WAVE")
        var pos = 12
        var rate = -1; var channels = -1; var bits = -1
        var dataOff = -1; var dataLen = -1
        while (pos + 8 <= payload.length && (rate < 0 || dataOff < 0)) {
          val id = new String(payload, pos, 4, "US-ASCII")
          val len = le32(payload, pos + 4)
          // a crafted negative length would leave pos unchanged and spin
          // this walk forever — worse than any exception; require jumps
          // to the catch → nulls, honoring the never-hang contract
          require(len >= 0, s"negative chunk length $len")
          if (id == "fmt ") {
            channels = le16(payload, pos + 10)
            rate = le32(payload, pos + 12)
            bits = le16(payload, pos + 22)
          } else if (id == "data") { dataOff = pos + 8; dataLen = len }
          pos += 8 + len + (len & 1) // chunks are word-aligned
        }
        require(rate > 0 && dataOff >= 0 && bits == 8,
          "only 8-bit PCM WAV supported")
        require(payload.length - dataOff >= dataLen, "truncated data chunk")
        Decoded(rate, channels, bucketMeans(payload, dataOff, dataLen, dim))
      } catch { case _: Throwable => Decoded(null, null, Array.empty[Float]) }
    }

    /** The raw PCM bytes of the data chunk (same chunk walk as
      * [[decode]]); empty array for malformed payloads — the
      * never-hang/never-throw contract.
      */
    def pcm(payload: Array[Byte]): Array[Byte] = {
      try {
        require(payload.length >= 44 &&
          new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
          new String(payload, 8, 4, "US-ASCII") == "WAVE")
        var pos = 12
        var dataOff = -1; var dataLen = -1
        while (pos + 8 <= payload.length && dataOff < 0) {
          val id = new String(payload, pos, 4, "US-ASCII")
          val len = le32(payload, pos + 4)
          require(len >= 0, s"negative chunk length $len")
          if (id == "data") { dataOff = pos + 8; dataLen = len }
          pos += 8 + len + (len & 1)
        }
        require(dataOff >= 0 && payload.length - dataOff >= dataLen,
          "missing or truncated data chunk")
        java.util.Arrays.copyOfRange(payload, dataOff, dataOff + dataLen)
      } catch { case _: Throwable => Array.empty[Byte] }
    }
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

  /** Synthetic REAL-PPM media frame: each document becomes a valid binary
    * PPM ("P6") image whose dimensions derive from the text length
    * (w = n%61+4, h = n%43+4) and whose raster bytes cycle
    * (media_id + i) mod 256 — fully deterministic, so an external oracle
    * can replay the decoded width/height/features from the documents
    * table alone, while the decoder genuinely parses the bytes (the
    * metadata struct deliberately carries NO dimensions: the payload
    * header is the only source).
    */
  def syntheticPpmMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").as("media_id"),
        length(coalesce(col("text"), lit(""))).as("n"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = r.getInt(1)
          val w = n % 61 + 4
          val h = n % 43 + 4
          val header = s"P6\n$w $h\n255\n"
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val raster = new Array[Byte](w * h * 3)
          var i = 0
          while (i < raster.length) {
            raster(i) = ((id + i) % 256).toByte; i += 1
          }
          Row(id, header ++ raster, Row("image", "ppm", null, null, null))
        }
      }(enc)
  }

  /** Synthetic REAL-WAV media frame: each document becomes a valid
    * RIFF/WAVE 8-bit PCM payload — sample rate 8000 + (id%8)·1000,
    * channels 1 + (id%2), (n%96)+8 sample bytes cycling (7·id + i) mod
    * 256. Like [[syntheticPpmMedia]], metadata carries no audio params:
    * the RIFF chunks are the only source, so the gate proves the
    * chunk-walk.
    */
  def syntheticWavMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").as("media_id"),
        length(coalesce(col("text"), lit(""))).as("n"))
      .mapPartitions { rows =>
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        rows.map { r =>
          val id = r.getLong(0)
          val n = r.getInt(1)
          val rate = 8000 + (id % 8).toInt * 1000
          val channels = 1 + (id % 2).toInt
          val samples = Array.tabulate((n % 96) + 8)(i => ((7 * id + i) % 256).toByte)
          val payload = "RIFF".getBytes ++ le32(36 + samples.length) ++
            "WAVE".getBytes ++ "fmt ".getBytes ++ le32(16) ++
            le16(1) ++ le16(channels) ++ le32(rate) ++
            le32(rate * channels) ++ le16(channels) ++ le16(8) ++
            "data".getBytes ++ le32(samples.length) ++ samples
          Row(id, payload, Row("audio", "wav", null, null, null))
        }
      }(enc)
  }

  /** [[syntheticWavMedia]] with one perturbed sample per clip — sample
    * j = id mod len bumps by +16 (mod 256) and the media_id shifts by
    * `idOffset`: the engineered near-duplicate the audio fingerprint
    * must still pair with its original.
    */
  def syntheticWavMediaPerturbed(docs: DataFrame, idOffset: Long): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").as("media_id"),
        length(coalesce(col("text"), lit(""))).as("n"))
      .mapPartitions { rows =>
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        rows.map { r =>
          val id = r.getLong(0)
          val n = r.getInt(1)
          val rate = 8000 + (id % 8).toInt * 1000
          val channels = 1 + (id % 2).toInt
          val len = (n % 96) + 8
          val j = (id % len).toInt
          val samples = Array.tabulate(len) { i =>
            val v = (7 * id + i) % 256
            (if (i == j) (v + 16) % 256 else v).toByte
          }
          val payload = "RIFF".getBytes ++ le32(36 + samples.length) ++
            "WAVE".getBytes ++ "fmt ".getBytes ++ le32(16) ++
            le16(1) ++ le16(channels) ++ le32(rate) ++
            le32(rate * channels) ++ le16(channels) ++ le16(8) ++
            "data".getBytes ++ le32(samples.length) ++ samples
          Row(id + idOffset, payload, Row("audio", "wav", null, null, null))
        }
      }(enc)
  }

  /** Synthetic REAL-PNG media frame: the same deterministic pixel
    * formulas as [[syntheticPpmMedia]] (w = n%61+4, h = n%43+4, raster
    * byte i = (id+i)%256 in row-major RGB order), but the payload is a
    * genuine PNG encoded by `javax.imageio` — so [[ImageIoDecoder]] must
    * run a real codec (zlib inflate, scanline unfiltering, color-model
    * conversion) to get the raster back. PNG is lossless, so the decoded
    * pixels equal the generated ones and the SAME oracle formulas that
    * replay the PPM gates replay this one; the gate therefore proves a
    * true encode → real-codec-decode round trip, not plumbing.
    */
  def syntheticPngMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id").as("media_id"),
        length(coalesce(col("text"), lit(""))).as("n"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory encode, no temp files
        rows.map { r =>
          val id = r.getLong(0)
          val n = r.getInt(1)
          val w = n % 61 + 4
          val h = n % 43 + 4
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          var i = 0L
          while (y < h) {
            var x = 0
            while (x < w) {
              val rr = ((id + i) % 256).toInt
              val g = ((id + i + 1) % 256).toInt
              val b = ((id + i + 2) % 256).toInt
              img.setRGB(x, y, (rr << 16) | (g << 8) | b)
              i += 3
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray, Row("image", "png", null, null, null))
        }
      }(enc)
  }

  /** Perturbed twin of [[syntheticPpmMedia]]: same dimensions and raster
    * formula keyed on the ORIGINAL doc_id, but the first `flipBytes`
    * raster bytes are inverted (255 − v) and the media_id is offset — each
    * output is a near-duplicate copy of the corresponding original image
    * differing in a handful of pixels. Deterministic like the original
    * generator, so an oracle can replay both corpora; feeds the
    * perceptual-hash near-dup gate with planted almost-copies.
    */
  def syntheticPpmMediaPerturbed(docs: DataFrame, idOffset: Long,
                                 flipBytes: Int = 3): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).as("n"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = r.getInt(1)
          val w = n % 61 + 4
          val h = n % 43 + 4
          val header = s"P6\n$w $h\n255\n"
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val raster = new Array[Byte](w * h * 3)
          var i = 0
          while (i < raster.length) {
            val v = ((id + i) % 256).toInt
            raster(i) = (if (i < flipBytes) 255 - v else v).toByte
            i += 1
          }
          Row(id + idOffset, header ++ raster, Row("image", "ppm", null, null, null))
        }
      }(enc)
  }

  /** Perceptual average hash (aHash) over PPM payloads: nearest-neighbor
    * sample the raster on a `gridW × gridH` grid (the [[resizePpm]]
    * source-index arithmetic), sum each cell's RGB bytes, and set bit p
    * iff cell p's sum is ≥ the grid mean — packed row-major into one
    * long. All-integer arithmetic (the mean test is the cross-multiplied
    * `cells · s_p ≥ Σ s`, never a division), so an external engine
    * replays every bit exactly; visually near-identical images land
    * within a few bits of each other, which makes the hash the media
    * analog of [[TextAnalysis.fingerprint]] for exact dedup and of
    * simhash for near-dedup ([[phashNearDuplicates]]).
    *
    * Output: (media_id, width, height, phash). Malformed payloads yield
    * null phash (never throw — one bad file must not kill a partition).
    * Scale: shuffle-free partition-local scan like [[decodeFeatures]];
    * the hash is 8 bytes/image regardless of image size, so every
    * downstream dedup step shuffles hashes, never pixels.
    */
  def averageHash(media: DataFrame, gridW: Int = 8, gridH: Int = 8,
                  decoder: Decoder = PpmDecoder): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      s"grid must fit a 64-bit hash, got $gridW x $gridH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("phash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val cells = gridW * gridH
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val parsed =
            if (payload == null) None else decoder.raster(payload)
          parsed match {
            case Some((w, h, bytes, off)) =>
              val sums = new Array[Long](cells)
              var total = 0L
              var p = 0
              while (p < cells) {
                val sy = (p / gridW) * h / gridH
                val sx = (p % gridW) * w / gridW
                val src = off + 3 * (sy * w + sx)
                val s = (bytes(src) & 0xff) + (bytes(src + 1) & 0xff) +
                  (bytes(src + 2) & 0xff)
                sums(p) = s
                total += s
                p += 1
              }
              var hash = 0L
              p = 0
              while (p < cells) {
                if (cells * sums(p) >= total) hash |= 1L << p
                p += 1
              }
              Row(id, w, h, hash)
            case None => Row(id, null, null, null)
          }
        }
      }(enc)
  }

  /** Media near-duplicate pairs: [[averageHash]] fingerprints fed through
    * the pigeonhole Hamming banding shared with simhash
    * ([[Dedup.bandedHammingPairs]]) — candidate generation is a
    * band-keyed self-equi-join on 8-byte hashes (pixels never shuffle),
    * verification one popcount per candidate. Undecodable payloads (null
    * phash) are excluded: a null fingerprint matches nothing.
    * Output: (media_a < media_b, hamming).
    */
  def phashNearDuplicates(media: DataFrame, maxHamming: Int = 3,
                          gridW: Int = 8, gridH: Int = 8,
                          decoder: Decoder = PpmDecoder): DataFrame =
    Dedup.bandedHammingPairs(
      averageHash(media, gridW, gridH, decoder)
        .where(col("phash").isNotNull)
        .select(col("media_id").as("doc_id"), col("phash").as("fp")),
      gridW * gridH, maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Partition-batched decode → (media_id, width, height, feature vector).
    * The decoder is instantiated once per partition (amortized init), rows
    * stream through without collecting the partition. Dimensions decoded
    * from the payload itself win; the metadata struct is the fallback for
    * formats that don't carry them in-band (FakeDecoder formats). Media
    * tables are format-partitioned in practice — pick the matching
    * decoder ([[PpmDecoder]], [[WavDecoder]], codec-backed, ...) per
    * format slice.
    */
  def decodeFeatures(media: DataFrame, dim: Int = 16,
                     decoder: Decoder = FakeDecoder): DataFrame = {
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
          if (payload == null)
            Row(r.getLong(0),
              if (r.isNullAt(2)) null else r.getInt(2),
              if (r.isNullAt(3)) null else r.getInt(3),
              null)
          else {
            val d = decoder.decode(payload, dim)
            Row(r.getLong(0),
              if (d.width != null) d.width
              else if (r.isNullAt(2)) null else r.getInt(2),
              if (d.height != null) d.height
              else if (r.isNullAt(3)) null else r.getInt(3),
              d.features.toSeq)
          }
        }
      }(enc)
  }

  /** Frame-level audio features over REAL WAV payloads: the PCM stream
    * framed into fixed `frameLen`-sample windows (tail frame short),
    * per frame the RMS energy of the centered samples (x − 128 for
    * 8-bit PCM) and the zero-crossing count (sign flips of consecutive
    * centered samples) — the two classic cheap audio descriptors
    * (silence/music/speech triage before any model). Pure integer
    * arithmetic until the final RMS sqrt, rounded 6dp HALF_UP, so the
    * whole thing replays from the synthetic generation formulas in an
    * external oracle. mapPartitions batch walk like every media kernel
    * (imperative byte loop — the documented justification); malformed
    * payloads contribute no frames.
    *
    * Output: (media_id, frame_idx, n_samples, rms, zero_crossings).
    */
  def wavFrameFeatures(media: DataFrame, frameLen: Int = 16): DataFrame = {
    require(frameLen >= 2, s"frameLen must be >= 2, got $frameLen")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("rms", DoubleType),
      StructField("zero_crossings", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          if (payload == null) Iterator.empty
          else {
            val pcm = WavDecoder.pcm(payload)
            val id = r.getLong(0)
            (0 until pcm.length by frameLen).iterator.map { off =>
              val len = math.min(frameLen, pcm.length - off)
              var sum2 = 0L
              var zc = 0L
              var i = 0
              while (i < len) {
                val c = (pcm(off + i) & 0xff) - 128
                sum2 += c.toLong * c
                if (i > 0) {
                  val p = (pcm(off + i - 1) & 0xff) - 128
                  if ((p < 0) != (c < 0)) zc += 1
                }
                i += 1
              }
              val rms = BigDecimal(math.sqrt(sum2.toDouble / len))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Row(id, off / frameLen, len, rms, zc)
            }
          }
        }
      }(enc)
  }

  /** Nearest-neighbor resize for PPM payloads — a REAL image transform
    * over the binary column: parse the source header, sample
    * src(x·w/outW, y·h/outH) per output pixel, re-emit a valid PPM. Runs
    * partition-batched like [[decodeFeatures]]; non-PPM or malformed
    * payloads map to a null payload (one bad file never kills the
    * batch). The output feeds any downstream consumer of the media
    * schema — including [[decodeFeatures]], which is how the gate
    * verifies the resample arithmetic end to end.
    */
  def resizePpm(media: DataFrame, outW: Int, outH: Int): DataFrame =
    resizeImage(media, outW, outH, PpmDecoder)

  /** Format-generic twin of [[resizePpm]]: the source raster comes from
    * any [[Decoder]] with raster access (PPM header walk, `javax.imageio`
    * codec decode, ...), the resample arithmetic is the same deterministic
    * nearest-neighbor loop, and the output is always re-emitted as PPM so
    * downstream consumers need only the one uncompressed reader.
    */
  def resizeImage(media: DataFrame, outW: Int, outH: Int,
                  decoder: Decoder): DataFrame = {
    require(outW >= 1 && outH >= 1, s"output dims must be >= 1, got $outW x $outH")
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val parsed =
            if (payload == null) None else decoder.raster(payload)
          // same never-throw contract as decode: raster() rejects
          // degenerate/overflowing headers, and the belt-and-braces catch
          // maps any residual surprise to a null payload, not a dead task
          try parsed match {
            case Some((w, h, bytes, off)) =>
              val out = new Array[Byte](outW * outH * 3)
              var i = 0
              var y = 0
              while (y < outH) {
                val sy = y * h / outH
                var x = 0
                while (x < outW) {
                  val src = off + 3 * (sy * w + x * w / outW)
                  out(i) = bytes(src); out(i + 1) = bytes(src + 1)
                  out(i + 2) = bytes(src + 2)
                  i += 3; x += 1
                }
                y += 1
              }
              val header = s"P6\n$outW $outH\n255\n"
                .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
              Row(id, header ++ out, Row("image", "ppm", outW, outH, null))
            case None => Row(id, null, Row("image", "ppm", null, null, null))
          } catch { case _: Throwable =>
            Row(id, null, Row("image", "ppm", null, null, null))
          }
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

  /** Audio fingerprint (Haitsma–Kalker shape): sign-of-energy-delta
    * bits over (frame × polyphase sub-band) cells — each frame's
    * samples split into 4 interleaved sub-bands (i mod 4, the cheap
    * stand-in for the spectral bands a real HK fingerprint filters),
    * bit (f, band) is 1 iff e[f][band] > e[f+1][band]. LINEAR frame
    * deltas only (bits beyond (F−1)·4 stay 0 — wrapping would repeat
    * each delta and let a one-frame edit flip every repetition), so a
    * one-sample edit flips ≤ 2 bits while 4 bands × frames gives
    * enough entropy that short clips don't saturate the Hamming
    * radius. Energies are exact integer Σc²; undecodable payloads
    * yield null. Same imperative byte-walk justification as
    * [[wavFrameFeatures]]. Output: (media_id, afp).
    */
  def audioFingerprint(media: DataFrame, frameLen: Int = 16,
                       bits: Int = 48): DataFrame = {
    require(frameLen >= 2 && bits >= 1 && bits <= 63,
      s"bad fingerprint params frameLen=$frameLen bits=$bits")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("afp", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val id = r.getLong(0)
          if (payload == null) Row(id, null)
          else {
            val pcm = WavDecoder.pcm(payload)
            if (pcm.length == 0) Row(id, null)
            else {
              val nf = (pcm.length + frameLen - 1) / frameLen
              val e = Array.ofDim[Long](nf, 4)
              var i = 0
              while (i < pcm.length) {
                val c = (pcm(i) & 0xff) - 128
                e(i / frameLen)(i & 3) += c.toLong * c
                i += 1
              }
              var fp = 0L
              var b = 0
              val nd = math.min(bits, (nf - 1) * 4)
              while (b < nd) {
                if (e(b >> 2)(b & 3) > e((b >> 2) + 1)(b & 3)) fp |= (1L << b)
                b += 1
              }
              Row(id, fp)
            }
          }
        }
      }(enc)
  }

  /** Audio near-duplicate pairs: [[audioFingerprint]] through the same
    * pigeonhole Hamming banding as [[phashNearDuplicates]] — PCM never
    * shuffles, only 32-bit fingerprints. Output: (media_a < media_b,
    * hamming).
    */
  def audioNearDuplicates(media: DataFrame, maxHamming: Int = 4,
                          frameLen: Int = 16, bits: Int = 48): DataFrame =
    Dedup.bandedHammingPairs(
      audioFingerprint(media, frameLen, bits)
        .where(col("afp").isNotNull)
        .select(col("media_id").as("doc_id"), col("afp").as("fp")),
      bits, maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Stage a media frame to one file per payload (`<media_id>.<ext>`) —
    * executor-side writes (no driver data path), idempotent via a
    * `_staged` marker. Gate/test scaffolding for the binaryFile source
    * round-trip; real crawls arrive as files already.
    */
  def stageMediaFiles(media: DataFrame, dir: String, ext: String): Unit = {
    val marker = java.nio.file.Paths.get(dir, "_staged")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    media.select("media_id", "payload").foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.getLong(0)}.$ext"),
            r.getAs[Array[Byte]](1))
        }
    }
    java.nio.file.Files.createFile(marker)
  }

  /** Lift a binaryFile-source frame (path, content) into the media
    * shape: media_id parsed from the file name, null meta (the PPM/WAV
    * decoders recover dimensions in-band).
    */
  def fromBinaryFiles(files: DataFrame, ext: String): DataFrame =
    files.select(
      regexp_extract(col("path"), s"([0-9]+)\\.$ext$$", 1)
        .cast("long").as("media_id"),
      col("content").as("payload"),
      lit(null).cast(mediaMetaSchema).as("meta"))
}

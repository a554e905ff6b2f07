package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried next to an opaque payload column. */
case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

/** A multimodal record: payload as an opaque `binary` column + typed
  * metadata — the schema a 100 TB media corpus would use (payload column
  * stays unread unless the query touches it; parquet column pruning skips
  * the heavy bytes for metadata-only queries). */
case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

/** Fixed-size feature vector extracted from a payload. */
case class MediaFeatures(media_id: Long, kind: String, dim: Int, features: Array[Float])

/** Decoded-image facts: true dimensions + an order-stable pixel checksum. */
case class ImageStats(media_id: Long, width: Int, height: Int, pixel_checksum: Long)

/** One fully-decoded record: features for every kind, decode facts for
  * images (None for the stubbed kinds / undecodable payloads). */
case class MediaDecoded(media_id: Long, kind: String, features: Array[Float],
                        width: Option[Int], height: Option[Int], checksum: Option[Long])

/** One sampled frame of a "video" payload. */
case class MediaFrame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

/** Decoded-audio facts: format fields from the real WAV header parse plus
  * an order-stable rolling checksum over the decoded PCM samples. */
case class AudioStats(doc_id: Long, sample_rate: Long, n_samples: Long,
                      duration_ms: Long, sample_checksum: Long)

/** Multimodal-column operators.
  *
  * IMAGE decode is REAL: payloads are genuine PNG files and the decoder is
  * JDK `javax.imageio` (no external dependency), running per-partition
  * behind the `mapPartitions` seam. AUDIO decode is REAL too: payloads are
  * genuine RIFF/PCM16 WAV files and the decoder is JDK
  * `javax.sound.sampled` (the built-in WAVE reader). Only VIDEO decode
  * remains a clearly-marked deterministic STUB (`fakeDecode`) — the JDK
  * ships no video codecs and the container has no codec libraries; a real
  * deployment swaps `fakeDecode` for a codec without touching any of the
  * dataflow around it.
  *
  * Scale notes: decode runs per-partition with no shuffle; feature
  * extraction is embarrassingly parallel; `frameSample` is a flatMap (1→N)
  * that never materializes a whole video in memory beyond one record.
  */
object MediaOps {

  /** Deterministic tiny PNG: pixel (x, y) is a pure function of (seed, x, y),
    * losslessly encoded by ImageIO — decode recovers the exact raster on any
    * JVM. Used to synthesize the image leg of the fake corpus; real corpora
    * read `binary` payload columns from parquet with the same schema. */
  def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = seed * 6364136223846793005L + (x * 31L + y * 131L + 17L) * 2654435761L
        img.setRGB(x, y, ((v >>> 16) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Row-major rolling hash over the decoded RGB raster — stable across
    * JVMs (PNG is lossless, the traversal order is fixed). */
  def pixelChecksum(img: BufferedImage): Long = {
    var h = 1125899906842597L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = 31 * h + (img.getRGB(x, y) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Sample-rate / sample-count dials for the synthesized WAV leg — pure
    * functions of the row so the decoder-free oracle can recompute them. */
  def wavSampleRate(nChars: Int): Int = 8000 + (nChars % 3) * 4000
  def wavSampleCount(nChars: Int): Int = nChars % 200 + 50

  /** Deterministic 16-bit PCM mono WAV: sample i is a pure function of
    * (seed, i) in wrapping Java long arithmetic, wrapped in a canonical
    * 44-byte RIFF header — decode via `javax.sound.sampled` recovers the
    * exact sample sequence on any JVM. The audio analog of [[pngBytes]]. */
  def wavBytes(seed: Long, sampleRate: Int, n: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = seed * 6364136223846793005L + (i + 1) * 2654435761L
      val u = ((v >>> 16) & 0xFFFF).toInt // unsigned 16-bit PCM LE
      data(2 * i) = (u & 0xFF).toByte
      data(2 * i + 1) = ((u >> 8) & 0xFF).toByte
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(x: Int): Unit = { bos.write(x & 0xFF); bos.write((x >> 8) & 0xFF)
      bos.write((x >> 16) & 0xFF); bos.write((x >> 24) & 0xFF) }
    def le16(x: Int): Unit = { bos.write(x & 0xFF); bos.write((x >> 8) & 0xFF) }
    ascii("RIFF"); le32(36 + data.length); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1) /* PCM */ ; le16(1) /* mono */
    le32(sampleRate); le32(sampleRate * 2) /* byte rate */
    le16(2) /* block align */ ; le16(16) /* bits */
    ascii("data"); le32(data.length); bos.write(data)
    bos.toByteArray
  }

  /** Deterministic fake media corpus derived from `documents`: doc_id % 3
    * picks the kind; IMAGE payloads are real PNGs ([[pngBytes]]), AUDIO
    * payloads are real WAVs ([[wavBytes]]), video payloads are opaque text
    * bytes (their decode is stubbed). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "text", "CAST(n_chars AS INT) AS n")
      .as[(Long, String, Int)]
      .map { case (id, text, n) =>
        (id % 3) match {
          case 0 =>
            val w = n % 16 + 4
            val h = n % 12 + 3
            MediaRecord(id, "image", pngBytes(id, w, h), MediaMeta("image/png", w, h, 0L))
          case 1 =>
            val rate = wavSampleRate(n)
            val samples = wavSampleCount(n)
            MediaRecord(id, "audio", wavBytes(id, rate, samples),
              MediaMeta("audio/wav", 0, 0, samples.toLong * 1000L / rate))
          case _ =>
            MediaRecord(id, "video", text.getBytes("UTF-8"),
              MediaMeta("video/mp4", n % 640 + 1, n % 480 + 1, n.toLong * 10))
        }
      }
  }

  /** STUB decode for audio/video: derives `dim` floats from a rolling hash
    * of the bytes so the downstream dataflow (batching, schema,
    * partitioning) is fully exercised and reproducible. */
  private[multimodal] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // rolling polynomial hash, deterministic
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 16).toInt % 1000) / 1000.0f
      d += 1
    }
    out
  }

  /** REAL image features: decode the PNG with ImageIO, bucket the raster
    * into `dim` cells row-major, mean luminance per cell in [0, 1].
    * Payloads ImageIO cannot decode fall back to the stub (the corpus
    * contract is "image payloads are decodable"; the fallback keeps a
    * corrupt record from killing a 100 TB job, mirroring the tolerant
    * JSON parse of the streaming leg). */
  private[multimodal] def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) fakeDecode(bytes, dim) else featuresOf(img, dim)
  }

  /** Feature extraction over an ALREADY-decoded raster — shared by the
    * per-op paths and the single-decode combined pass. */
  private def featuresOf(img: BufferedImage, dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Int](dim)
    var i = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        val b = i % dim
        sums(b) += lum
        counts(b) += 1
        i += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      out(d) = if (counts(d) == 0) 0f else sums(d).toFloat / (counts(d) * 765f)
      d += 1
    }
    out
  }

  /** Feature extraction: per-partition batch over the payload column.
    * `mapPartitions` (not per-row UDF) so decoder/model init amortizes once
    * per partition — the Spark idiom for expensive per-record libraries.
    * Images decode for real; audio/video go through the stub. */
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // (real impl: init audio/video codecs once here; ImageIO is static)
      it.map { m =>
        val f = if (m.kind == "image") imageFeatures(m.bytes, dim)
                else fakeDecode(m.bytes, dim)
        MediaFeatures(m.media_id, m.kind, dim, f)
      }
    }
  }

  /** Decoded-image facts via the REAL decoder: true raster dimensions and
    * an order-stable pixel checksum per image. */
  def imageStats(media: Dataset[MediaRecord]): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { m =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.bytes))
        if (img == null) None
        else Some(ImageStats(m.media_id, img.getWidth, img.getHeight, pixelChecksum(img)))
      }
    }
  }

  /** Decoded-audio facts via the REAL decoder: `javax.sound.sampled` (the
    * JDK's built-in WAVE reader) parses the RIFF header into an
    * `AudioFormat` and streams the PCM frames; the checksum folds the
    * decoded unsigned 16-bit samples in order (h = 31·h + u16, wrapping).
    * Runs in `mapPartitions` like the image decoder; an undecodable
    * payload is dropped instead of killing the job (the tolerant-parse
    * contract of the streaming leg). */
  def audioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { m =>
        try {
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new ByteArrayInputStream(m.bytes))
          val fmt = in.getFormat
          val pcm = in.readAllBytes()
          val n = pcm.length / 2
          var h = 1125899906842597L
          var i = 0
          while (i < n) {
            val u = (pcm(2 * i) & 0xFF) | ((pcm(2 * i + 1) & 0xFF) << 8)
            h = 31 * h + u
            i += 1
          }
          val rate = fmt.getSampleRate.toLong
          Some(AudioStats(m.media_id, rate, n.toLong, n.toLong * 1000L / rate, h))
        } catch { case _: Exception => None }
      }
    }
  }

  /** q81 — audio pipeline end-to-end: corpus → real WAV decode → per-doc
    * format facts + PCM checksum. The q50 pattern for the audio modality:
    * the Spark side decodes actual RIFF bytes with the JDK's WAVE reader,
    * while the oracle recomputes every column WITHOUT a decoder from the
    * (doc_id, n_chars)-pure sample function — a hash match proves the
    * encode → header parse → PCM decode → checksum path is the identity. */
  def audioFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame =
    audioStats(fromDocuments(docs)).toDF().orderBy("doc_id")

  /** Frame sampling: split each "video" payload into fixed-size frame
    * chunks (stub for keyframe extraction) — 1→N flatMap, no shuffle. */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int = 64): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.bytes.grouped(frameBytes).zipWithIndex.map {
        case (chunk, i) => MediaFrame(m.media_id, i, chunk)
      }
    }
  }

  /** Resize stub: metadata-only transform (a real resize would re-encode
    * `bytes`; the stub scales the typed metadata and tags the mime). */
  def resize(media: Dataset[MediaRecord], maxSide: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val s = math.max(m.meta.width, m.meta.height)
      if (m.kind != "image" || s <= maxSide) m
      else m.copy(meta = m.meta.copy(
        width = m.meta.width * maxSide / s, height = m.meta.height * maxSide / s))
    }
  }

  /** Single-decode combined pass: every payload is decoded ONCE per record
    * (feature extraction and image facts share the raster) — at corpus
    * scale the decode dominates, so a second decode pass would double the
    * dominant cost. Undecodable image payloads fall back to the stub with
    * null decode facts (a corrupt record must not kill the job). */
  def decodeAll(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = if (m.kind == "image")
          javax.imageio.ImageIO.read(new ByteArrayInputStream(m.bytes)) else null
        if (img == null)
          MediaDecoded(m.media_id, m.kind, fakeDecode(m.bytes, dim), None, None, None)
        else
          MediaDecoded(m.media_id, m.kind, featuresOf(img, dim),
            Some(img.getWidth), Some(img.getHeight), Some(pixelChecksum(img)))
      }
    }
  }

  /** q50 — media pipeline end-to-end: corpus → ONE decode pass → per-kind
    * stats. The image row carries REAL decoded facts (summed dimensions +
    * an order-independent XOR of pixel checksums — bit_xor so combine order
    * and overflow cannot perturb it); audio/video rows have null decode
    * facts (their decode is the declared stub). Fully oracle-checked: the
    * raster is a pure integer function of (doc_id, x, y), so the oracle
    * recomputes width/height/checksum WITHOUT a PNG decoder ([[oracles]]) —
    * a hash match proves the encode → ImageIO decode → checksum path is the
    * identity on that function (PNG losslessness included). */
  def mediaFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAll(fromDocuments(docs))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        expr("bit_xor(checksum)").as("pixel_checksum_xor"))
      .orderBy("kind")
  }

  /** DuckDB oracle for [[mediaFeatureStats]] — computed, not literal.
    *
    * [[pngBytes]] fills pixel (x, y) with
    * `rgb = ((seed*6364136223846793005 + (x*31 + y*131 + 17)*2654435761) >>> 16) & 0xFFFFFF`
    * in wrapping Java long arithmetic, and [[pixelChecksum]] folds
    * `h = 31*h + rgb` row-major from 1125899906842597. Both are emulated in
    * exact HUGEINT arithmetic mod 2^64 (`>>> 16` = unsigned div by 65536,
    * `& 0xFFFFFF` = mod 16777216; the signed long is recovered by
    * subtracting 2^64 above 2^63), with the row-major pixel fold as a
    * list_reduce over range(0, w*h) where x = i % w, y = i // w.
    * The Spark side never sees these formulas — it decodes the actual PNG
    * bytes with ImageIO — so a hash match independently verifies the whole
    * encode/decode/checksum/aggregate path. */
  def oracles: Map[String, String] = {
    val U = "18446744073709551616" // 2^64
    val px = s"((((doc_id::HUGEINT * 6364136223846793005 + " +
      s"((i % w) * 31 + (i // w) * 131 + 17) * 2654435761) % $U + $U) % $U // 65536) % 16777216)"
    // q81: [[wavBytes]] stores sample i as the unsigned 16-bit
    // `((doc_id*6364136223846793005 + (i+1)*2654435761) >>> 16) & 0xFFFF`,
    // and [[audioStats]] folds h = 31·h + u16 over the DECODED samples.
    // The oracle recomputes both from the formula in HUGEINT mod-2^64
    // arithmetic — no WAV parser anywhere on the DuckDB side.
    val u16 = s"((((doc_id::HUGEINT * 6364136223846793005 + " +
      s"(i + 1) * 2654435761) % $U + $U) % $U // 65536) % 65536)"
    Map(
      "q81_audio_features" ->
        s"""WITH a AS (
              SELECT doc_id,
                     8000 + (CAST(n_chars AS INTEGER) % 3) * 4000 AS rate,
                     CAST(n_chars AS INTEGER) % 200 + 50 AS n
              FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 1),
            chk AS (
              SELECT doc_id,
                     CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - $U
                               ELSE hu END AS BIGINT) AS cks
              FROM (SELECT doc_id,
                           list_reduce(
                             list_prepend(1125899906842597::HUGEINT,
                               list_transform(range(0, n), i -> $u16)),
                             (acc, p) -> (acc * 31 + p) % $U) AS hu
                    FROM a))
            SELECT a.doc_id AS doc_id,
                   CAST(rate AS BIGINT) AS sample_rate,
                   CAST(n AS BIGINT) AS n_samples,
                   CAST(n AS BIGINT) * 1000 // rate AS duration_ms,
                   chk.cks AS sample_checksum
            FROM a JOIN chk ON a.doc_id = chk.doc_id
            ORDER BY doc_id""",
      "q50_media_features" ->
      s"""WITH m AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(n_chars AS INTEGER) % 16 + 4 AS w,
                   CAST(n_chars AS INTEGER) % 12 + 3 AS h
            FROM documents),
          chk AS (
            SELECT doc_id,
                   CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - $U
                             ELSE hu END AS BIGINT) AS cks
            FROM (SELECT doc_id,
                         list_reduce(
                           list_prepend(1125899906842597::HUGEINT,
                             list_transform(range(0, w*h), i -> $px)),
                           (acc, p) -> (acc * 31 + p) % $U) AS hu
                  FROM m WHERE kind = 'image'))
          SELECT m.kind AS kind, COUNT(*) AS n_media,
                 CAST(SUM(CASE WHEN m.kind = 'image' THEN m.w END) AS BIGINT) AS sum_width,
                 CAST(SUM(CASE WHEN m.kind = 'image' THEN m.h END) AS BIGINT) AS sum_height,
                 bit_xor(chk.cks) AS pixel_checksum_xor
          FROM m LEFT JOIN chk ON m.doc_id = chk.doc_id
          GROUP BY m.kind ORDER BY m.kind""")
  }
}

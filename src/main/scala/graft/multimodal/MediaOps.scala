package graft.multimodal

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

/** One sampled frame of a "video" payload. */
case class MediaFrame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

/** Multimodal-column operators.
  *
  * The Spark-side plumbing (schema, `Dataset` encoders, partition-batched
  * processing via `mapPartitions`, flat frame sampling) is real and tested;
  * the actual image/audio DECODE step is a clearly-marked deterministic
  * STUB (`fakeDecode`) because codec libraries are not in this container.
  * A real deployment swaps `fakeDecode` for a decoder without touching any
  * of the dataflow around it.
  *
  * Scale notes: decode runs per-partition with no shuffle; feature
  * extraction is embarrassingly parallel; `frameSample` is a flatMap (1→N)
  * that never materializes a whole video in memory beyond one record.
  */
object MediaOps {

  /** Deterministic fake media corpus derived from `documents` (text bytes as
    * payload; kind round-robins over image/audio/video). Test scaffolding —
    * a real corpus would be read from parquet with this exact schema. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr(
      "doc_id AS media_id",
      "element_at(array('image/png','audio/wav','video/mp4'), CAST(doc_id % 3 AS INT) + 1) AS mime",
      "encode(text, 'UTF-8') AS bytes",
      "CAST(n_chars AS INT) AS n")
      .selectExpr(
        "media_id",
        "CASE WHEN mime LIKE 'image%' THEN 'image' WHEN mime LIKE 'audio%' THEN 'audio' ELSE 'video' END AS kind",
        "bytes",
        "named_struct('mime', mime, 'width', pmod(n, 640) + 1, 'height', pmod(n, 480) + 1, 'durationMs', CAST(n AS BIGINT) * 10) AS meta")
      .as[MediaRecord]
  }

  /** STUB decode: a real implementation would decode the payload with a
    * codec library here. This deterministic fake derives `dim` floats from
    * a rolling hash of the bytes so the downstream dataflow (batching,
    * schema, partitioning) is fully exercised and reproducible. */
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

  /** Feature extraction: per-partition batch over the payload column.
    * `mapPartitions` (not per-row UDF) so a real decoder could amortize
    * model/codec init once per partition — the Spark idiom for expensive
    * per-record libraries. */
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // (real impl: init decoder once here)
      it.map(m => MediaFeatures(m.media_id, m.kind, dim, fakeDecode(m.bytes, dim)))
    }
  }

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

  /** q50 (rows-only check) — media pipeline end-to-end: fake corpus →
    * decode → per-kind feature stats. Exercises the full plumbing. */
  def mediaFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeFeatures(fromDocuments(docs))
      .groupByKey(_.kind)
      .agg(count(lit(1)).as("n_media").as[Long])
      .toDF("kind", "n_media")
      .orderBy("kind")
  }
}

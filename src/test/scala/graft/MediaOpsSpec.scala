package graft

import graft.multimodal.{MediaOps, MediaRecord, MediaMeta}

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "image payload text here", "en", "s1", 23L),
    (1L, "audio payload somewhat longer text content", "en", "s1", 42L),
    (2L, "video payload " + ("frame " * 30), "en", "s1", 194L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("fromDocuments builds typed media records with opaque bytes + metadata") {
    val media = MediaOps.fromDocuments(docs).collect().sortBy(_.media_id)
    assert(media.map(_.kind).toSeq === Seq("image", "audio", "video"))
    // the image payload is a REAL PNG file (magic bytes), not text
    assert(media(0).bytes.take(4) sameElements Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(media(1).bytes sameElements "audio payload somewhat longer text content".getBytes("UTF-8"))
    assert(media(2).meta.mime === "video/mp4")
  }

  test("imageStats decodes real PNGs: exact dimensions + stable pixel checksum") {
    // doc 0: n_chars=23 → 11×5 raster by construction (23%16+4, 23%12+3)
    val stats = MediaOps.imageStats(MediaOps.fromDocuments(docs)).collect()
    assert(stats.length === 1)
    val s = stats.head
    assert((s.width, s.height) === ((23 % 16 + 4, 23 % 12 + 3)))
    // the distributed decode must agree with a local ImageIO round-trip
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaOps.pngBytes(0L, s.width, s.height)))
    assert(s.pixel_checksum === MediaOps.pixelChecksum(img))
  }

  test("decodeFeatures is deterministic with a fixed dim batch shape") {
    val f1 = MediaOps.decodeFeatures(MediaOps.fromDocuments(docs), dim = 16)
      .collect().sortBy(_.media_id)
    val f2 = MediaOps.decodeFeatures(MediaOps.fromDocuments(docs), dim = 16)
      .collect().sortBy(_.media_id)
    assert(f1.length === 3)
    assert(f1.forall(_.features.length === 16))
    assert(f1.zip(f2).forall { case (a, b) => a.features sameElements b.features })
  }

  test("frameSample splits only videos into fixed-size frames") {
    val media = MediaOps.fromDocuments(docs)
    val frames = MediaOps.frameSample(media, frameBytes = 64).collect()
    val videoLen = media.collect().find(_.kind == "video").get.bytes.length
    assert(frames.forall(_.media_id === 2L))
    assert(frames.length === (videoLen + 63) / 64)
    assert(frames.map(_.frame_bytes.length).sum === videoLen)
  }

  test("resize caps image dimensions and leaves other kinds alone") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(
      MediaRecord(0L, "image", Array[Byte](1), MediaMeta("image/png", 6400, 4800, 0L)),
      MediaRecord(1L, "audio", Array[Byte](1), MediaMeta("audio/wav", 0, 0, 10L))
    ).toDS()
    val out = MediaOps.resize(media, maxSide = 640).collect().sortBy(_.media_id)
    assert(out(0).meta.width === 640 && out(0).meta.height === 480)
    assert(out(1).meta === MediaMeta("audio/wav", 0, 0, 10L))
  }
}

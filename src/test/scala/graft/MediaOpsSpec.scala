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
    // the audio payload is a REAL RIFF/WAVE file (magic bytes), not text
    assert(media(1).bytes.take(4) sameElements "RIFF".getBytes("US-ASCII"))
    assert(media(1).bytes.slice(8, 12) sameElements "WAVE".getBytes("US-ASCII"))
    // the video payload is a REAL motion-PNG container: big-endian frame
    // count (n=194 → 194%6+2 = 4 frames), then length-prefixed PNG frames
    assert(media(2).meta.mime === "video/x-motion-png")
    assert(media(2).bytes.take(4) sameElements Array[Byte](0, 0, 0, 4))
    assert(media(2).bytes.slice(8, 12) sameElements
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }

  test("audioStats decodes real WAVs: header format facts + stable PCM checksum") {
    // doc 1: n_chars=42 → rate 8000 + (42%3)*4000 = 8000, 42%200+50 = 92
    // samples by construction
    val stats = MediaOps.audioStats(MediaOps.fromDocuments(docs)).collect()
    assert(stats.length === 1)
    val s = stats.head
    assert(s.doc_id === 1L)
    assert(s.sample_rate === 8000L)
    assert(s.n_samples === 92L)
    assert(s.duration_ms === 92L * 1000L / 8000L)
    // the decoded checksum must equal the direct fold of the generator
    // formula — proving decode recovers the exact sample sequence
    var h = 1125899906842597L
    (0 until 92).foreach { i =>
      val v = 1L * 6364136223846793005L + (i + 1) * 2654435761L
      h = 31 * h + ((v >>> 16) & 0xFFFF).toInt
    }
    assert(s.sample_checksum === h)
  }

  test("audioStats drops undecodable payloads instead of failing the job") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(
      MediaRecord(1L, "audio", MediaOps.wavBytes(1L, 8000, 10), MediaMeta("audio/wav", 0, 0, 1L)),
      MediaRecord(4L, "audio", "not a wav at all".getBytes("UTF-8"), MediaMeta("audio/wav", 0, 0, 1L))
    ).toDS()
    val stats = MediaOps.audioStats(media).collect()
    assert(stats.map(_.doc_id).toSeq === Seq(1L))
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

  test("frameSample splits only videos, on REAL frame boundaries") {
    // doc 2: n=194 → 4 frames of 8×5; every sampled frame is a standalone
    // decodable PNG of the frame dims, and stride 2 keeps frames 0 and 2
    val media = MediaOps.fromDocuments(docs)
    val frames = MediaOps.frameSample(media).collect().sortBy(_.frame_no)
    assert(frames.forall(_.media_id === 2L))
    assert(frames.map(_.frame_no).toSeq === Seq(0, 1, 2, 3))
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame_bytes))
      assert(img != null, s"frame ${f.frame_no} is not a decodable PNG")
      assert((img.getWidth, img.getHeight) === ((194 % 10 + 4, 194 % 8 + 3)))
    }
    val strided = MediaOps.frameSample(media, stride = 2).collect()
    assert(strided.map(_.frame_no).toSeq.sorted === Seq(0, 2))
  }

  test("videoStats decodes real motion-PNG: frame count, dims, ordered checksum") {
    // doc 2: n=194 → 4 frames of 8×5; the decoded checksum must equal the
    // direct nested fold of the raster generator formula — proving the
    // container parse + per-frame PNG decode recover the exact rasters
    val stats = MediaOps.videoStats(MediaOps.fromDocuments(docs)).collect()
    assert(stats.length === 1)
    val s = stats.head
    assert(s.doc_id === 2L)
    assert(s.n_frames === 4L)
    assert((s.width, s.height) === ((8L, 5L)))
    val (w, h) = (8, 5)
    var outer = 1125899906842597L
    (0 until 4).foreach { f =>
      val seed = 2L * 1000003L + f
      var inner = 1125899906842597L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val v = seed * 6364136223846793005L + (x * 31L + y * 131L + 17L) * 2654435761L
          inner = 31 * inner + ((v >>> 16) & 0xFFFFFF)
        }
      }
      outer = 31 * outer + inner
    }
    assert(s.frames_checksum === outer)
  }

  test("videoStats drops malformed containers instead of failing the job") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(
      MediaRecord(2L, "video", MediaOps.videoBytes(2L, 4, 3, 2),
        MediaMeta("video/x-motion-png", 4, 3, 80L)),
      MediaRecord(5L, "video", "definitely not frames".getBytes("UTF-8"),
        MediaMeta("video/x-motion-png", 4, 3, 80L))
    ).toDS()
    assert(MediaOps.videoStats(media).collect().map(_.doc_id).toSeq === Seq(2L))
  }

  test("snapshot-read media queries equal the direct-synthesis paths bit-for-bit") {
    // the parquet media snapshot must be a pure materialization: payload
    // bytes and metadata round-trip parquet exactly, so the three
    // snapshot-reading query paths must produce the same rows as decoding
    // the synthesized corpus directly
    val dir = java.nio.file.Files.createTempDirectory("graft_media_spec_").toString
    MediaOps.fromDocuments(docs).toDF().write.mode("overwrite").parquet(dir)
    val snap = spark.read.parquet(dir)
    assert(MediaOps.mediaFeatureStatsOf(snap).collect().toSeq ===
      MediaOps.mediaFeatureStats(spark, docs).collect().toSeq)
    assert(MediaOps.audioFeatureStatsOf(snap).collect().toSeq ===
      MediaOps.audioFeatureStats(spark, docs).collect().toSeq)
    assert(MediaOps.videoFeatureStatsOf(snap).collect().toSeq ===
      MediaOps.videoFeatureStats(spark, docs).collect().toSeq)
    // the modality predicate must reach the parquet scan: a snapshot
    // consumer of one kind never reads the other two thirds' payload bytes
    val plan = MediaOps.audioFeatureStatsOf(snap)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("kind"),
      s"kind filter not pushed to the snapshot scan:\n${plan.take(1500)}")
  }

  test("resize is a REAL raster transform: re-encoded payload decodes at the capped dims with NN-sampled pixels") {
    val spark2 = spark
    import spark2.implicits._
    val src = MediaOps.pngBytes(7L, 16, 12)
    val media = Seq(
      MediaRecord(0L, "image", src, MediaMeta("image/png", 16, 12, 0L)),
      MediaRecord(1L, "audio", Array[Byte](1), MediaMeta("audio/wav", 0, 0, 10L)),
      MediaRecord(2L, "image", Array[Byte](1), MediaMeta("image/png", 999, 999, 0L))
    ).toDS()
    val out = MediaOps.resize(media, maxSide = 8).collect().sortBy(_.media_id)
    assert(out(0).meta.width === 8 && out(0).meta.height === 6)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).bytes))
    assert(img.getWidth === 8 && img.getHeight === 6,
      "payload and metadata must agree after the re-encode")
    val orig = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
    for (y <- 0 until 6; x <- 0 until 8)
      assert((img.getRGB(x, y) & 0xFFFFFF) ===
        (orig.getRGB(x * 16 / 8, y * 12 / 6) & 0xFFFFFF), s"($x,$y)")
    assert(out(1).meta === MediaMeta("audio/wav", 0, 0, 10L))
    assert(out(2).bytes.length === 1,
      "an undecodable payload passes through unchanged, never kills the job")
  }

  test("q207 thumbnail: NN samples equal the raster formula on a hand image; corpus replay by real decode") {
    // hand raster: every thumbnail sample must equal the generator
    // formula at the NN coordinates — the decode→resample path end to end
    val w = 10; val h = 7; val seed = 3L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaOps.pngBytes(seed, w, h)))
    val px = (0 until 16).map { t =>
      val x = (t % 4) * w / 4; val y = (t / 4) * h / 4
      val v = seed * 6364136223846793005L + (x * 31L + y * 131L + 17L) * 2654435761L
      ((v >>> 16) & 0xFFFFFF, img.getRGB(x, y) & 0xFFFFFF)
    }
    px.foreach { case (want, got) => assert(got.toLong === want) }
    // corpus: the graded query equals a driver replay through the real
    // decoder at sf0.001
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val real = MediaOps.thumbnailCensus(docs).collect()
    val want = docs.selectExpr("doc_id", "CAST(n_chars AS INT)")
      .where("doc_id % 3 = 0").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      .map { case (id, n) =>
        val (iw, ih) = (n % 16 + 4, n % 12 + 3)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(MediaOps.pngBytes(id, iw, ih)))
        val ps = (0 until 16).map { t =>
          (im.getRGB((t % 4) * iw / 4, (t / 4) * ih / 4) & 0xFFFFFF).toLong
        }
        var acc = 1125899906842597L
        ps.foreach(p => acc = 31 * acc + p)
        (id, iw.toLong, ih.toLong, acc, ps.sum, ps.head)
      }
    assert(real.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq === want.toSeq)
    val reparted = MediaOps.thumbnailCensus(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q223 dhash: hand bits exact; banding is pigeonhole-complete at Hamming<=3; over-cap buckets excluded; corpus laws") {
    // hand grid: luminances descending along each row → every comparison
    // lum(x) > lum(x+1) is true → all 64 bits set; ascending → none
    val desc = Array.tabulate(72)(t => (100 - t % 9).toLong)
    assert(MediaOps.dhashOf(desc) === -1L, "descending rows must set all 64 bits")
    val asc = Array.tabulate(72)(t => (t % 9).toLong)
    assert(MediaOps.dhashOf(asc) === 0L, "ascending rows must set no bits")
    // one strict drop at row 0 between x=2 and x=3 → exactly bit 2
    val oneBit = Array.tabulate(72)(t => if (t < 9 && t > 2) 0L else 5L)
    assert(MediaOps.dhashOf(oneBit) === 4L, "a single comparison sets its own bit")

    // PIGEONHOLE COMPLETENESS: any pair within Hamming 3 differs in at
    // most 3 of the 4 16-bit bands, so at least one band key matches and
    // the band equi-join MUST surface the pair. Plant pairs at every
    // distance 0..3 with the flipped bits scattered across bands (the
    // adversarial placement: 3 flips hitting 3 DIFFERENT bands leaves
    // exactly one matching band).
    val rnd = new scala.util.Random(223)
    val bases = (0 until 32).map(i => (i.toLong, rnd.nextLong()))
    val planted = bases.map { case (id, h) =>
      val d = (id % 4).toInt // distance 0..3
      // flip d bits in d DISTINCT bands: worst case for the pigeonhole
      val flipped = (0 until d).foldLeft(h)((acc, b) => acc ^ (1L << (b * 16 + (id % 16).toInt)))
      (id + 1000L, flipped)
    }
    val hand = (bases ++ planted).toDF("id", "h")
    val pairs = MediaOps.dhashPairs(hand).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    bases.foreach { case (id, _) =>
      val d = id % 4
      assert(pairs.get((id, id + 1000L)).contains(d),
        s"planted pair at Hamming $d must surface with its exact distance")
    }
    // random 64-bit hashes sit near Hamming 32: no unplanted pair passes
    // the verify unless genuinely close (none here, seeded)
    assert(pairs.keys.forall { case (a, b) => b - a === 1000L },
      "chance band collisions must be rejected by the exact popcount verify")

    // OVER-CAP EXCLUSION: a degenerate corpus (every hash identical)
    // collapses into single band buckets; with > cap members they are
    // excluded — a hard quadratic bound traded for in-bucket recall
    val degenerate = (0L until (MediaOps.PhBandBucketCap + 10L))
      .map(i => (i, 42L)).toDF("id", "h")
    assert(MediaOps.dhashPairs(degenerate).count() === 0L,
      "over-cap buckets must be excluded, not exploded quadratically")
    // at the cap boundary the bucket still pairs in full
    val atCap = (0L until MediaOps.PhBandBucketCap).map(i => (i, 42L)).toDF("id", "h")
    assert(MediaOps.dhashPairs(atCap).count() ===
      MediaOps.PhBandBucketCap * (MediaOps.PhBandBucketCap - 1) / 2)

    // corpus: planted brightness twins dominate, all within the radius,
    // and the artifact replays bit-identically under repartitioning
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = MediaOps.dhashNearDup(docs).collect()
    assert(rows.nonEmpty, "the planted twins guarantee a nonempty artifact")
    assert(rows.forall(_.getLong(2) <= MediaOps.PhHamK))
    val plantedRows = rows.filter(_.getBoolean(3))
    assert(plantedRows.nonEmpty)
    assert(plantedRows.count(_.getLong(2) === 0L) * 2 > plantedRows.length,
      "most brightness twins carry Hamming 0 (no channel wrapped)")
    val again = MediaOps.dhashNearDup(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(again === rows.map(_.toSeq).toSeq)
  }

  test("q225 dhash clusters: union-find laws, planted twins drop in favor of originals, singletons keep; replay") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = MediaOps.dhashClusters(docs).collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // totality: every hashed id exactly once
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.length === MediaOps.imageDhashes(docs).count())
    // keep ⟺ the id IS its cluster label, and the label is the cluster min
    rows.foreach { r =>
      assert(r.getBoolean(2) === (r.getLong(0) === r.getLong(1)))
      assert(r.getLong(1) <= r.getLong(0), "cluster label must be the minimum")
    }
    // union-find law: endpoints of every surviving pair share a cluster
    val pairs = MediaOps.dhashNearDup(docs).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(cluster(p.getLong(0)) === cluster(p.getLong(1)),
        s"pair ${p.getLong(0)}–${p.getLong(1)} split across clusters")
    }
    // planted twins cluster BELOW their originals: variant ids (offset
    // range) never survive as keepers of a multi-member cluster
    val planted = rows.filter(_.getLong(0) >= MediaOps.PhVariantOffset)
    assert(planted.nonEmpty)
    val paired = pairs.flatMap(p => Seq(p.getLong(0), p.getLong(1))).toSet
    planted.filter(r => paired(r.getLong(0))).foreach { r =>
      assert(!r.getBoolean(2),
        "a paired brightness twin must drop in favor of its original")
    }
    // replay invariance
    val again = MediaOps.dhashClusters(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(again === rows.map(_.toSeq).toSeq)
  }
}

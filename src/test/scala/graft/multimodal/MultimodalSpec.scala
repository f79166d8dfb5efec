package graft.multimodal

import graft.SparkSpec
import graft.sources.{StoreConfig, VectorStoreCatalog}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("batched feature extraction: every row gets a unit-norm feature vector") {
    val feats = Multimodal.extractFeatures(media, Multimodal.StubDecodeKernel(32),
      batchSize = 7) // deliberately not dividing 30: exercises ragged batches
    val rows = feats.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.features.length == 32))
    assert(rows.forall { r =>
      math.abs(math.sqrt(r.features.map(x => x.toDouble * x).sum) - 1.0) < 1e-4
    })
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media, Multimodal.StubDecodeKernel(32))
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(rows.forall(r => again(r.media_id) == r.features.toSeq))
  }

  test("frame sampling explodes only videos, one frame per interval") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500).collect()
    val videos = media.filter(_.kind == "video").collect()
    assert(frames.nonEmpty)
    val perVideo = frames.groupBy(_.media_id)
    assert(perVideo.keySet == videos.map(_.media_id).toSet)
    videos.foreach { v =>
      val expected = (v.meta.duration_ms / 500).toInt + 1
      assert(perVideo(v.media_id).length == expected,
        s"video ${v.media_id}: ${perVideo(v.media_id).length} != $expected")
      assert(perVideo(v.media_id).map(_.ts_ms).sorted.toSeq ==
        (0 until expected).map(_ * 500L))
    }
  }

  test("multimodal features flow into the vector store + kNN path") {
    val feats = Multimodal.extractFeatures(media, Multimodal.StubDecodeKernel(16))
    val root = java.nio.file.Files.createTempDirectory("graft_mm").toString
    val catalog = new VectorStoreCatalog(spark, root)
    catalog.create("mm", "stub16", StoreConfig(dimension = 16))
    catalog.addVectors("mm", "stub16", Multimodal.toVectorRows(feats))
    assert(catalog.count("mm", "stub16") == 30)

    val q = feats.filter(_.media_id == 0L).head().features.map(_.toDouble).toSeq
    val hits = catalog.query("mm", "stub16", q, k = 3).collect()
    // meta is TypedMeta-encoded: media_id stays an int literal, kind a string
    assert(hits.head.getAs[Map[String, String]]("meta")("media_id") == "0")
    assert(hits.head.getAs[Map[String, String]]("meta")("kind") == "\"image\"")
    // filtered by modality through the typed path (string "image", not int)
    val imgOnly = catalog.queryTyped("mm", "stub16", q, k = 10,
      typedFilter = Map("kind" -> "image")).collect()
    assert(imgOnly.nonEmpty)
    assert(imgOnly.forall(_.getAs[Map[String, String]]("meta")("kind") == "\"image\""))
    // typed discrimination: media_id is an INT in meta — int filter finds it
    val byId = catalog.queryTyped("mm", "stub16", q, k = 1,
      typedFilter = Map("media_id" -> 0)).collect()
    assert(byId.length == 1)
    assert(catalog.queryTyped("mm", "stub16", q, k = 1,
      typedFilter = Map("media_id" -> "0")).isEmpty)
  }

  test("videoNearDupPairs: frame-set Jaccard finds overlapping videos, " +
    "stop-frames dropped by the cap") {
    // global frame pool: frame g's bytes depend only on g; video v carries
    // frames {2v .. 2v+5} plus a COMMON "black frame" (g = 999) — consecutive
    // videos share 4 of 6 regular frames, videos >= 3 apart share none
    def frameBytes(g: Long): Array[Byte] =
      Array.tabulate(40 + (g % 9).toInt)(j => ((g * 131 + j * 7) % 256).toByte)
    val vids = (0L until 10L).map { v =>
      val frames = (0 until 6).map(f => frameBytes(2 * v + f)) :+ frameBytes(999L)
      Multimodal.MediaRow(v, "video",
        VideoCodec.encodeAviMjpeg(50000L, frames),
        Multimodal.MediaMeta(0, 0, "avi", 7 * 50L))
    }
    val media = spark.createDataset(vids).repartition(3)
    val fps = Multimodal.videoFrameFingerprints(media, everyMs = 50L)
    // 10 videos x 7 distinct frames; the common frame is ONE fp across all
    assert(fps.count() == 70)
    assert(fps.groupBy("fp").count().filter($"count" === 10).count() == 1)

    // cap 5 < 10 drops the common frame from the kept universe entirely:
    // sizes become 6 and only genuine content overlap pairs survive
    val pairs = Multimodal.videoNearDupPairs(fps, minJaccard = 0.2,
        maxVideosPerFp = 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sorted
    assert(pairs.forall(p => p._4 == 6 && p._5 == 6))
    // adjacent videos: shared 4, jaccard 4/8 = 0.5; distance 2: 2/10 = 0.2
    val expected = (0L until 9L).map(v => (v, v + 1, 4L, 0.5)) ++
      (0L until 8L).map(v => (v, v + 2, 2L, 0.2))
    assert(pairs.map(p => (p._1, p._2, p._3, p._6)).toSet == expected.toSet,
      s"got ${pairs.mkString(", ")}")

    // without the cap, the shared stop-frame links EVERY pair of videos
    val uncapped = Multimodal.videoNearDupPairs(fps, minJaccard = 0.01)
    assert(uncapped.count() == 45)
  }

  test("audioWindowFingerprints: clips sharing aligned PCM segments pair; " +
    "a mid-window trim breaks alignment; non-audio ignored") {
    val win = 800 // 100 ms at 8000 Hz
    def seg(sid: Long): Array[Double] = Array.tabulate(win)(i =>
      (((sid * 7919 + i.toLong * 4799) % 65535) - 32767).toDouble / 32767.0)
    def clip(id: Long, segs: Seq[Long], dropSamples: Int = 0) =
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000,
          segs.toArray.flatMap(seg).drop(dropSamples)),
        Multimodal.MediaMeta(0, 0, "wav", segs.length * 100L))
    val media = spark.createDataset(Seq(
      clip(1L, Seq(0L, 1L, 2L)),
      clip(2L, Seq(1L, 2L, 3L)), // shares segments 1,2 with clip 1
      clip(3L, Seq(10L, 11L, 12L)), // unrelated
      clip(4L, Seq(0L, 1L, 2L), dropSamples = win / 2), // trimmed copy of 1
      Multimodal.MediaRow(5L, "image", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(0, 0, "png", 0))))
    val fps = Multimodal.audioWindowFingerprints(media, 100L)
    // clips 1-3: 3 windows each; trimmed clip 4: 2 full windows; image: none
    assert(fps.groupBy("media_id").count().as[(Long, Long)].collect().toMap ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 2L))
    val pairs = Multimodal.videoNearDupPairs(fps, minJaccard = 0.4)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // only (1, 2): 2 shared of 3+3 -> jaccard 0.5; the trim shifts every
    // window boundary, so clip 4 shares NOTHING with its source
    assert(pairs.toSeq == Seq((1L, 2L, 2L, 3L, 3L, 0.5)), s"got ${pairs.toSeq}")
  }

  test("videoFrameFingerprints perceptual: re-encoded frames share a dHash") {
    def noiseImage(seed: Int): ImageCodec.RawImage = {
      val rnd = new java.util.Random(seed.toLong)
      val rgb = new Array[Byte](32 * 32 * 3)
      rnd.nextBytes(rgb)
      ImageCodec.RawImage(32, 32, rgb)
    }
    // same three pixel-frames, one video PPM-encoded, the other PNG-encoded
    val asPpm = (0 until 3).map(i => ImageCodec.encodePpm(noiseImage(i)))
    val asPng = (0 until 3).map(i => ImageCodec.encodePng(noiseImage(i)))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", VideoCodec.encodeAviMjpeg(50000L, asPpm),
        Multimodal.MediaMeta(0, 0, "avi", 150L)),
      Multimodal.MediaRow(2L, "video", VideoCodec.encodeAviMjpeg(50000L, asPng),
        Multimodal.MediaMeta(0, 0, "avi", 150L))))
    // content hashes disagree (different bytes) -> no pair
    val exact = Multimodal.videoNearDupPairs(
      Multimodal.videoFrameFingerprints(media, 50L), minJaccard = 0.5)
    assert(exact.isEmpty)
    // perceptual dHashes agree (same pixels) -> full-overlap pair
    val perc = Multimodal.videoNearDupPairs(
      Multimodal.videoFrameFingerprints(media, 50L, perceptual = true),
      minJaccard = 0.5)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(perc.toSeq == Seq((1L, 2L, 3L, 3L, 3L, 1.0)), s"got ${perc.toSeq}")
  }

  test("imageNearDupPairs pairs re-encoded copies, ignores unrelated images") {
    // 10 distinct deterministic-noise images as PPM; the first 5 duplicated
    // as PNG re-encodings (different bytes, same pixels -> same dHash)
    def noiseImage(seed: Int): ImageCodec.RawImage = {
      val rnd = new java.util.Random(seed.toLong)
      val rgb = new Array[Byte](64 * 64 * 3)
      rnd.nextBytes(rgb)
      ImageCodec.RawImage(64, 64, rgb)
    }
    def row(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaRow(id, "image", bytes, Multimodal.MediaMeta(64, 64, "img", 0))
    val originals = (0 until 10).map(i =>
      row(i.toLong, ImageCodec.encodePpm(noiseImage(i))))
    val copies = (0 until 5).map(i =>
      row(100L + i, ImageCodec.encodePng(noiseImage(i))))
    // one non-image row and one undecodable image row: both must be ignored
    val junk = Seq(
      Multimodal.MediaRow(500L, "audio", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(0, 0, "wav", 0)),
      row(501L, Array[Byte](9, 9, 9)))
    val media = spark.createDataset(originals ++ copies ++ junk)
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // exactly the planted (i, 100+i) pairs at hamming 0
    assert(pairSet == (0 until 5).map(i => (i.toLong, 100L + i)).toSet,
      s"got $pairSet")
    assert(pairs.forall(_._3 == 0))
  }
}

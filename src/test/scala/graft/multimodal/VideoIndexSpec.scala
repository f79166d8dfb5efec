package graft.multimodal

import graft.SparkSpec
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class VideoIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // global frame pool: frame g's payload depends only on g (distinct g give
  // distinct bytes — 131 is invertible mod 256), so videos sharing g values
  // genuinely share frame content through the real demux
  private def frameBytes(g: Long): Array[Byte] =
    Array.tabulate(40 + (g % 9).toInt)(j => ((g * 131 + j * 7) % 256).toByte)

  private def video(id: Long, gs: Seq[Long]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "video",
      VideoCodec.encodeAviMjpeg(50000L, gs.map(frameBytes)),
      Multimodal.MediaMeta(0, 0, "avi", gs.length * 50L))

  private def media(rows: Multimodal.MediaRow*) = spark.createDataset(rows)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("dedupBatch equals videoNearDupAgainst on precomputed fingerprints") {
    val corpus = media((0L until 6L).map(v =>
      video(v, (0 until 6).map(f => 2 * v + f.toLong))): _*)
    val batch = media((100L until 104L).map(v =>
      video(v, (0 until 6).map(f => 2 * (v - 100) + f.toLong))): _*)
    val idx = VideoIndex.build(corpus, tmp("graft_vidx"),
      everyMs = 50L, minJaccard = 0.3)
    val inc = idx.dedupBatch(batch)
      .select($"batch_id", $"corpus_id", $"shared", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val ref = Multimodal.videoNearDupAgainst(
        Multimodal.videoFrameFingerprints(batch, 50L),
        Multimodal.videoFrameFingerprints(corpus, 50L), minJaccard = 0.3)
      .select($"batch_id", $"corpus_id", $"shared", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(inc == ref)
    // batch video 10x is an exact frame-set copy of corpus video x
    assert((100L until 104L).forall(b =>
      inc.contains((b, b - 100, 6L, 1.0))), s"got $inc")
  }

  test("stop-frame cap: a frame in every corpus video is dropped from " +
    "candidates, but sizes and jaccard stay full-set") {
    // every corpus video carries stop-frame 999; cap 3 < 5 drops it
    val corpus = media((0L until 5L).map(v =>
      video(v, (0 until 4).map(f => 10 * v + f.toLong) :+ 999L)): _*)
    // the batch probe shares ONLY the stop-frame with corpus videos 1..4,
    // and 2 content frames + the stop-frame with corpus video 0
    val batch = media(video(100L, Seq(0L, 1L, 999L)))
    val idx = VideoIndex.build(corpus, tmp("graft_vidx_cap"),
      everyMs = 50L, minJaccard = 0.1)
    val hits = idx.dedupBatch(batch, maxDocsPerFp = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // stop-frame dropped: videos 1..4 have no candidate left; video 0
    // matches on its 2 content frames with FULL sizes (3 and 5): j = 2/6
    assert(hits.toSeq == Seq((100L, 0L, 2L, 3L, 5L, 2.0 / 6.0)),
      s"got ${hits.toSeq}")
    // uncapped, the stop-frame adds 1 shared with everyone
    val un = idx.dedupBatch(batch, maxDocsPerFp = Int.MaxValue)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(un.length == 5 && un.exists(_ == ((100L, 0L, 3L, 3L, 5L, 0.6))),
      s"got ${un.toSeq}")
  }

  test("ingestBatch: corpus dup dropped, within-batch dup dropped, " +
    "cross-batch state; dropped fps never appended") {
    val idx = VideoIndex.build(media(video(1L, Seq(0L, 1L, 2L, 3L))),
      tmp("graft_vidx_ing"), everyMs = 50L, minJaccard = 0.5)
    val b1 = idx.ingestBatch(media(
      video(10L, Seq(0L, 1L, 2L, 3L)), // corpus copy -> dropped
      video(11L, Seq(20L, 21L, 22L, 23L)), // fresh -> kept
      video(12L, Seq(20L, 21L, 22L, 23L)))) // dup of kept 11 -> dropped
      .collect().map(_.media_id).sorted
    assert(b1.toSeq == Seq(11L))
    val b2 = idx.ingestBatch(media(
      video(20L, Seq(20L, 21L, 22L, 23L)), // dup of batch-1 survivor 11
      video(21L, Seq(30L, 31L, 32L, 33L)))) // fresh -> kept
      .collect().map(_.media_id).sorted
    assert(b2.toSeq == Seq(21L))
    assert(idx.storedFps().select($"id").distinct().as[Long].collect().sorted
      .toSeq == Seq(1L, 11L, 21L))
    assert(idx.storedSizes().as[(Long, Long)].collect().toMap ==
      Map(1L -> 4L, 11L -> 4L, 21L -> 4L))
  }

  test("ingestBatch refuses maxVideosPerFp = 1 — it would silently no-op " +
    "the within-batch sweep") {
    val idx = VideoIndex.build(media(video(1L, Seq(0L, 1L))),
      tmp("graft_vidx_req"), everyMs = 50L, minJaccard = 0.5)
    val e = intercept[IllegalArgumentException] {
      idx.ingestBatch(media(video(2L, Seq(5L, 6L))), maxDocsPerFp = 1)
    }
    assert(e.getMessage.contains("within-batch"))
  }

  test("load restores geometry; compaction preserves the match set and " +
    "the VIDEOS commit unit") {
    val path = tmp("graft_vidx_load")
    VideoIndex.build(media(video(1L, Seq(0L, 1L, 2L))), path,
      everyMs = 25L, perceptual = false, minJaccard = 0.4)
    val idx = VideoIndex.load(spark, path)
    assert(idx.everyMs == 25L && !idx.perceptual && idx.minJaccard == 0.4)
    idx.append(media(video(2L, Seq(10L, 11L, 12L))))
    val probe = media(video(100L, Seq(0L, 1L, 2L)))
    val before = idx.dedupBatch(probe).select($"corpus_id").as[Long]
      .collect().toSet
    idx.compact()
    val after = idx.dedupBatch(probe).select($"corpus_id").as[Long]
      .collect().toSet
    assert(before == after && before == Set(1L))
    // the replace commit must keep the VIDEOS unit — a raw fp-row count
    // would inflate sizeStats by frames-per-video
    assert(idx.maintenance().nDocs == 2L)
  }

  test("ingestMediaStream: chopping-independent kept set") {
    val batchRows = Seq(
      video(1000L, Seq(0L, 1L, 2L, 3L)), // corpus copy -> drops
      video(1001L, Seq(40L, 41L, 42L, 43L)), // fresh -> kept
      video(1002L, Seq(40L, 41L, 42L, 43L)), // dup of 1001 -> drops
      video(1003L, Seq(50L, 51L, 52L, 53L))) // fresh -> kept
    def rows(ids: Long*) =
      spark.createDataset(batchRows.filter(r => ids.contains(r.media_id))).toDF()
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("bytes", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("format", StringType),
        StructField("duration_ms", LongType))))))
    val splits = Seq(
      "one" -> Seq(rows(1000L, 1001L, 1002L, 1003L)),
      "two" -> Seq(rows(1000L, 1001L), rows(1002L, 1003L)))
    val results = splits.map { case (name, drops) =>
      val idx = VideoIndex.build(media(video(1L, Seq(0L, 1L, 2L, 3L))),
        tmp(s"graft_vstream_idx_$name"), everyMs = 50L, minJaccard = 0.5)
      val dropDir = tmp(s"graft_vstream_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream.schema(mediaSchema).parquet(dropDir)
      val q = Streams.ingestMediaStream(src, idx,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"media_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nDocs))
    }.toMap
    assert(results("one") == results("two"))
    assert(results("one")._1 == Set(1001L, 1003L))
    assert(results("one")._2 == 3L, "corpus video + the 2 kept videos")
  }
}

package graft.multimodal

import graft.SparkSpec
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AudioIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // global segment pool: segment sid's samples depend only on sid and the
  // values are exact PCM16 round-trips, so clips sharing sid values
  // genuinely share window-aligned PCM content through the real WAV codec
  private val Win = 1000 // samples = 125 ms at 8000 Hz
  private def seg(sid: Long): Array[Double] = Array.tabulate(Win)(i =>
    (((sid * 7919 + i.toLong * 4799) % 65535) - 32767).toDouble / 32767.0)

  private def clip(id: Long, sids: Seq[Long]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "audio",
      AudioCodec.encodeWavPcm16(8000, sids.toArray.flatMap(seg)),
      Multimodal.MediaMeta(0, 0, "wav", sids.length * 125L))

  private def media(rows: Multimodal.MediaRow*) = spark.createDataset(rows)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("dedupBatch equals the recompute path on the same split") {
    val corpus = media((0L until 6L).map(c =>
      clip(c, (0 until 4).map(s => 2 * c + s.toLong))): _*)
    val batch = media((100L until 104L).map(c =>
      clip(c, (0 until 4).map(s => 2 * (c - 100) + s.toLong))): _*)
    val idx = AudioIndex.build(corpus, tmp("graft_aidx"),
      windowMs = 125L, minJaccard = 0.3)
    val inc = idx.dedupBatch(batch)
      .select($"batch_id", $"corpus_id", $"shared", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val ref = Multimodal.videoNearDupAgainst(
        Multimodal.audioWindowFingerprints(batch, 125L),
        Multimodal.audioWindowFingerprints(corpus, 125L), minJaccard = 0.3)
      .select($"batch_id", $"corpus_id", $"shared", $"jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(inc == ref)
    // batch clip 10x is an exact window-set copy of corpus clip x
    assert((100L until 104L).forall(b =>
      inc.contains((b, b - 100, 4L, 1.0))), s"got $inc")
  }

  test("stop-window cap: a jingle window in every corpus clip is dropped " +
    "from candidates, but sizes and jaccard stay full-set") {
    // every corpus clip carries stop-segment 999 (a station ident / jingle);
    // cap 3 < 5 drops it
    val corpus = media((0L until 5L).map(c =>
      clip(c, (0 until 3).map(s => 10 * c + s.toLong) :+ 999L)): _*)
    val batch = media(clip(100L, Seq(0L, 1L, 999L)))
    val idx = AudioIndex.build(corpus, tmp("graft_aidx_cap"),
      windowMs = 125L, minJaccard = 0.1)
    val hits = idx.dedupBatch(batch, maxDocsPerFp = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // jingle dropped: clips 1..4 have no candidate left; clip 0 matches on
    // its 2 content windows with FULL sizes (3 and 4): j = 2/5
    assert(hits.toSeq == Seq((100L, 0L, 2L, 3L, 4L, 2.0 / 5.0)),
      s"got ${hits.toSeq}")
  }

  test("asOf pins a snapshot on the media families: the pinned match " +
    "ignores later appends; expired pins fail loudly") {
    val idx = AudioIndex.build(media(clip(1L, Seq(0L, 1L, 2L, 3L))),
      tmp("graft_aidx_asof"), windowMs = 125L, minJaccard = 0.5)
    idx.append(media(clip(2L, Seq(10L, 11L, 12L, 13L)))) // epoch 1
    idx.append(media(clip(3L, Seq(20L, 21L, 22L, 23L)))) // epoch 2
    val probe3 = media(clip(100L, Seq(20L, 21L, 22L, 23L)))
    assert(idx.dedupBatch(probe3).select($"corpus_id")
      .as[Long].collect().toSet == Set(3L))
    // pinned at epoch 1: clip 3 does not exist yet; clip 2 does
    assert(idx.dedupBatch(probe3, asOf = Some(1L)).count() == 0L)
    assert(idx.dedupBatch(media(clip(101L, Seq(10L, 11L, 12L, 13L))),
      asOf = Some(1L)).select($"corpus_id").as[Long].collect().toSet
      == Set(2L))
    idx.compact()
    val gone = intercept[IllegalArgumentException] {
      idx.dedupBatch(probe3, asOf = Some(1L))
    }
    assert(gone.getMessage.contains("not in the committed history"))
  }

  test("ingestBatch: corpus dup dropped, within-batch dup dropped, " +
    "cross-batch state; dropped fps never appended") {
    val idx = AudioIndex.build(media(clip(1L, Seq(0L, 1L, 2L, 3L))),
      tmp("graft_aidx_ing"), windowMs = 125L, minJaccard = 0.5)
    val b1 = idx.ingestBatch(media(
      clip(10L, Seq(0L, 1L, 2L, 3L)), // corpus copy -> dropped
      clip(11L, Seq(20L, 21L, 22L, 23L)), // fresh -> kept
      clip(12L, Seq(20L, 21L, 22L, 23L)))) // dup of kept 11 -> dropped
      .collect().map(_.media_id).sorted
    assert(b1.toSeq == Seq(11L))
    val b2 = idx.ingestBatch(media(
      clip(20L, Seq(20L, 21L, 22L, 23L)), // dup of batch-1 survivor 11
      clip(21L, Seq(30L, 31L, 32L, 33L)))) // fresh -> kept
      .collect().map(_.media_id).sorted
    assert(b2.toSeq == Seq(21L))
    assert(idx.storedFps().select($"id").distinct().as[Long].collect().sorted
      .toSeq == Seq(1L, 11L, 21L))
    assert(idx.storedSizes().as[(Long, Long)].collect().toMap ==
      Map(1L -> 4L, 11L -> 4L, 21L -> 4L))
  }

  test("load restores geometry; compaction preserves the match set and " +
    "the CLIPS commit unit; deleteIds takes a clip down") {
    val path = tmp("graft_aidx_load")
    AudioIndex.build(media(clip(1L, Seq(0L, 1L, 2L))), path,
      windowMs = 125L, minJaccard = 0.4)
    val idx = AudioIndex.load(spark, path)
    assert(idx.windowMs == 125L && idx.minJaccard == 0.4)
    idx.append(media(clip(2L, Seq(10L, 11L, 12L))))
    val probe = media(clip(100L, Seq(0L, 1L, 2L)))
    def hits() = idx.dedupBatch(probe).select($"corpus_id").as[Long]
      .collect().toSet
    val before = hits()
    idx.compact()
    assert(hits() == before && before == Set(1L))
    // the replace commit must keep the CLIPS unit — a raw fp-row count
    // would inflate sizeStats by windows-per-clip
    assert(idx.maintenance().nDocs == 2L)
    // takedown: the deleted clip never resurfaces through the probe path
    assert(idx.deleteIds(Set(1L)) == 1L)
    assert(hits().isEmpty)
    assert(idx.maintenance().nDocs == 1L)
  }

  test("ingestMediaStream over an audio index: chopping-independent kept set") {
    val batchRows = Seq(
      clip(1000L, Seq(0L, 1L, 2L, 3L)), // corpus copy -> drops
      clip(1001L, Seq(40L, 41L, 42L, 43L)), // fresh -> kept
      clip(1002L, Seq(40L, 41L, 42L, 43L)), // dup of 1001 -> drops
      clip(1003L, Seq(50L, 51L, 52L, 53L))) // fresh -> kept
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
      val idx = AudioIndex.build(media(clip(1L, Seq(0L, 1L, 2L, 3L))),
        tmp(s"graft_astream_idx_$name"), windowMs = 125L, minJaccard = 0.5)
      val dropDir = tmp(s"graft_astream_$name")
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
    assert(results("one")._2 == 3L, "corpus clip + the 2 kept clips")
  }
}

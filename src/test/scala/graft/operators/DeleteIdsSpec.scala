package graft.operators

import graft.SparkSpec
import graft.multimodal.{Multimodal, VideoCodec, VideoIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The delete leg of the EpochIndex lifecycle (append / compact /
  * maintenance / DELETE): takedown by id is a filtered rewrite with an
  * atomic replace commit, per family.
  */
class DeleteIdsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("FingerprintIndex.deleteIds: deleted doc stops matching, others " +
    "survive, commit unit and epoch count stay sane") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different content about spark partition shuffles here"
    val idx = FingerprintIndex.build(
      Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"), "doc_id", "text",
      tmp("graft_del_fp"))
    val probe = Seq((100L, t1), (101L, t2)).toDF("doc_id", "text")
    def hits() = idx.dedupBatch(probe, "doc_id", "text", threshold = 0.5)
      .select($"corpus_id").as[Long].collect().toSet
    assert(hits() == Set(1L, 2L))
    assert(idx.deleteIds(Set(1L)) == 1L)
    assert(hits() == Set(2L), "deleted doc must stop matching")
    assert(idx.maintenance().nDocs == 1L)
    assert(idx.maintenance().numEpochs == 1, "delete rewrites to ONE epoch")
    // absent ids cost nothing but the rewrite
    assert(idx.deleteIds(Set(999L)) == 0L)
    assert(hits() == Set(2L))
  }

  test("deleteIds on a gather-bucketed layout: the rewrite keeps the gb " +
    "partitioning and results") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different content about spark partition shuffles here"
    val idx = FingerprintIndex.build(
      Seq((1L, t1), (2L, t2), (3L, t1 + " tail")).toDF("doc_id", "text"),
      "doc_id", "text", tmp("graft_del_fpgb"), gatherBuckets = 4)
    val probe = Seq((100L, t1)).toDF("doc_id", "text")
    def hits() = idx.dedupBatch(probe, "doc_id", "text", threshold = 0.5)
      .select($"corpus_id").as[Long].collect().toSet
    assert(hits() == Set(1L, 3L))
    assert(idx.deleteIds(Set(1L)) == 1L)
    assert(hits() == Set(3L))
    // the rewritten docs layout still carries gb partition directories
    val docsDir = new java.io.File(s"${idx.docsPath}")
    val epochDirs = docsDir.listFiles().filter(_.getName.startsWith("epoch="))
    assert(epochDirs.length == 1)
    assert(epochDirs.head.listFiles().exists(_.getName.startsWith("gb=")),
      "bucketed layout must stay bucketed through the delete rewrite")
  }

  test("HammingIndex.deleteIds: a shared fp keeps its band rows until its " +
    "LAST doc is deleted") {
    // docs 1 and 2 share fp A; doc 3 has fp B
    val idx = HammingIndex.build(
      Seq((1L, 100L), (2L, 100L), (3L, 200L)).toDF("id", "fp"),
      "id", "fp", tmp("graft_del_ham"))
    def corpusHits(fp: Long) = idx.dedupBatch(
        Seq((900L, fp)).toDF("id", "fp"), "id", "fp", maxHamming = 0)
      .select($"corpus_id").as[Long].collect().toSet
    assert(corpusHits(100L) == Set(1L, 2L))
    assert(idx.deleteIds(Set(1L)) == 1L)
    // fp 100 still has doc 2: band rows must survive the rebuild
    assert(corpusHits(100L) == Set(2L))
    assert(idx.deleteIds(Set(2L)) == 1L)
    assert(corpusHits(100L) == Set.empty[Long],
      "last doc of the fp deleted -> no candidates")
    assert(corpusHits(200L) == Set(3L), "unrelated doc untouched")
    // band layout carries no orphan rows for fp 100
    assert(idx.storedBands().filter($"bucket" === (100L & 0xffff)).count() <=
      idx.storedFps().count() * 4)
  }

  test("WinnowIndex and EditIndex deletes keep their commit units; " +
    "VideoIndex delete drops both layouts") {
    val w = WinnowIndex.build(
      Seq((1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"),
        (2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"))
        .toDF("id", "text"), "id", "text", tmp("graft_del_win"))
    assert(w.deleteIds(Set(2L)) == 1L)
    assert(w.maintenance().nDocs == 1L, "WinnowIndex commit unit is DOCS")
    assert(w.storedFps().select($"id").distinct().as[Long].collect()
      .toSeq == Seq(1L))

    val e = EditIndex.build(
      Seq((1L, "alpha title"), (2L, "beta headline")).toDF("doc_id", "title"),
      "doc_id", "title", tmp("graft_del_edit"), maxEdits = 2)
    assert(e.deleteIds(Set(1L)) == 1L)
    assert(e.dedupBatch(Seq((10L, "alpha title")).toDF("doc_id", "title"),
      "doc_id", "title").isEmpty, "deleted title stops matching")

    def fb(g: Long): Array[Byte] =
      Array.tabulate(40)(j => ((g * 131 + j * 7) % 256).toByte)
    def video(id: Long, gs: Seq[Long]) = Multimodal.MediaRow(id, "video",
      VideoCodec.encodeAviMjpeg(50000L, gs.map(fb)),
      Multimodal.MediaMeta(0, 0, "avi", gs.length * 50L))
    val v = VideoIndex.build(
      spark.createDataset(Seq(video(1L, Seq(0L, 1L)), video(2L, Seq(5L, 6L)))),
      tmp("graft_del_vid"), everyMs = 50L, minJaccard = 0.5)
    assert(v.deleteIds(Set(1L)) == 1L)
    assert(v.maintenance().nDocs == 1L, "VideoIndex commit unit is VIDEOS")
    assert(v.storedSizes().select($"id").as[Long].collect().toSeq == Seq(2L))
    assert(v.dedupBatch(spark.createDataset(Seq(video(9L, Seq(0L, 1L)))))
      .isEmpty, "deleted video stops matching")
  }

  test("deleteIds refuses to EMPTY an index — a zero-row bucketed epoch " +
    "would be unreadable; emptying is a drop") {
    val idx = WinnowIndex.build(
      Seq((1L, "o1 o2 o3 o4 o5 o6 o7 o8 o9 o10 o11 o12")).toDF("id", "text"),
      "id", "text", tmp("graft_del_empty"))
    val ex = intercept[IllegalArgumentException](idx.deleteIds(Set(1L)))
    assert(ex.getMessage.contains("drop the index"))
    // the refused delete left the index fully intact
    assert(idx.maintenance().nDocs == 1L)
    assert(idx.storedFps().select($"id").distinct().count() == 1L)
  }

  test("SegmentIndex refuses id deletes — its hash set carries no " +
    "document attribution") {
    val idx = SegmentIndex.build(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text",
      tmp("graft_del_seg"), delimiter = " ")
    val ex = intercept[UnsupportedOperationException](idx.deleteIds(Set(1L)))
    assert(ex.getMessage.contains("unattributed"))
  }
}

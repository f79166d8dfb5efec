package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").cache()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("dedupBatch equals the batch pair operator restricted to cross pairs") {
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = WinnowIndex.build(corpus, "doc_id", "text", tmp("graft_widx"))
    val inc = idx.dedupBatch(batch, "doc_id", "text")
      .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
    // winnowingPairs emits id_a < id_b, so cross pairs are (corpus, batch)
    val glob = Dedup.winnowingPairs(docs, "doc_id", "text", minShared = 2)
      .filter($"id_a" < 400 && $"id_b" >= 400)
      .select($"id_b", $"id_a").as[(Long, Long)].collect().toSet
    assert(inc == glob)
    assert(inc.nonEmpty, "testdata is known to contain cross-split passages")
  }

  test("ingestBatch: corpus quote dropped, within-batch dup dropped, cross-batch state") {
    // 12-token docs guarantee >= 2 distinct selected fingerprints (9
    // windows, any one hash covers at most 4), so an exact copy always
    // clears minShared = 2
    val t1 = "p q r s t u v w x y z0 z1"
    val t2 = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    val t3 = "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12"
    val idx = WinnowIndex.build(
      Seq((1L, t1)).toDF("id", "text"), "id", "text", tmp("graft_widx_ing"))
    val b1 = idx.ingestBatch(
      Seq((10L, t1), (11L, t2), (12L, t2)).toDF("id", "text"), "id", "text")
      .select($"id").as[Long].collect().sorted
    assert(b1.toSeq == Seq(11L),
      "10 quotes the corpus; 12 duplicates kept lower-id 11")
    val b2 = idx.ingestBatch(
      Seq((20L, t2), (21L, t3)).toDF("id", "text"), "id", "text")
      .select($"id").as[Long].collect().sorted
    assert(b2.toSeq == Seq(21L), "20 duplicates batch-1 survivor 11")
    // dropped docs' fingerprints were never appended
    val storedDocs = idx.storedFps().select($"id").distinct()
      .as[Long].collect().sorted
    assert(storedDocs.toSeq == Seq(1L, 11L, 21L))
  }

  test("load restores geometry; a mismatched-geometry rebuild would not match") {
    val path = tmp("graft_widx_load")
    val corpus = Seq((1L, "a b c d e f g h i j k l")).toDF("id", "text")
    WinnowIndex.build(corpus, "id", "text", path,
      shingleLen = 2, window = 3, minShared = 1L)
    val loaded = WinnowIndex.load(spark, path)
    assert(loaded.shingleLen == 2 && loaded.window == 3 &&
      loaded.minShared == 1L)
    val hits = loaded.dedupBatch(
      Seq((10L, "a b c d e f g h i j k l")).toDF("id", "text"), "id", "text")
      .as[(Long, Long, Long)].collect()
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((10L, 1L)))
  }

  test("maintenance: compaction preserves the match set") {
    val path = tmp("graft_widx_cmp")
    val t = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12"
    val idx = WinnowIndex.build(
      Seq((1L, t)).toDF("id", "text"), "id", "text", path)
    idx.append(Seq((2L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11 n12"))
      .toDF("id", "text"), "id", "text")
    val before = idx.dedupBatch(Seq((10L, t)).toDF("id", "text"), "id", "text")
      .select($"corpus_id").as[Long].collect().toSet
    idx.compact()
    val after = idx.dedupBatch(Seq((10L, t)).toDF("id", "text"), "id", "text")
      .select($"corpus_id").as[Long].collect().toSet
    assert(before == after && before == Set(1L))
    // the replace commit must keep the DOCS unit (writeFps' invariant) —
    // a raw fp-row count would inflate sizeStats ~2/(w+1) x grams per doc
    assert(idx.maintenance().nDocs == 2L,
      "compaction must re-commit document counts, not fingerprint rows")
  }

  test("asOf pins a snapshot on the winnowing family: the pinned match " +
    "ignores later appends; expired pins fail loudly") {
    val path = tmp("graft_widx_asof")
    def doc(i: Long, prefix: String) =
      (i, (1 to 12).map(k => s"$prefix$k").mkString(" "))
    val idx = WinnowIndex.build(
      Seq(doc(1L, "a")).toDF("id", "text"), "id", "text", path)
    idx.append(Seq(doc(2L, "b")).toDF("id", "text"), "id", "text") // epoch 1
    idx.append(Seq(doc(3L, "c")).toDF("id", "text"), "id", "text") // epoch 2
    val probe = Seq(doc(10L, "c")).toDF("id", "text") // twin of doc 3
    assert(idx.dedupBatch(probe, "id", "text")
      .select($"corpus_id").as[Long].collect().toSet == Set(3L))
    // pinned at epoch 1, doc 3 does not exist yet
    assert(idx.dedupBatch(probe, "id", "text", asOf = Some(1L)).count() == 0L)
    val probeB = Seq(doc(11L, "b")).toDF("id", "text")
    assert(idx.dedupBatch(probeB, "id", "text", asOf = Some(1L))
      .select($"corpus_id").as[Long].collect().toSet == Set(2L))
    idx.compact()
    val gone = intercept[IllegalArgumentException] {
      idx.dedupBatch(probe, "id", "text", asOf = Some(1L))
    }
    assert(gone.getMessage.contains("not in the committed history"))
  }

  test("vacuum on a doc-unit family: fold keeps DOCUMENT counts and the " +
    "match set (commit-log arithmetic, no fp-row inflation)") {
    val path = tmp("graft_widx_vac")
    def doc(i: Long, prefix: String) =
      (i, (1 to 12).map(k => s"$prefix$k").mkString(" "))
    val idx = WinnowIndex.build(
      Seq(doc(1L, "a")).toDF("id", "text"), "id", "text", path)
    (2L to 4L).foreach(i => idx.append(
      Seq(doc(i, ('a' + i.toInt - 1).toChar.toString)).toDF("id", "text"),
      "id", "text"))
    val probe = Seq(doc(10L, "b")).toDF("id", "text") // twin of doc 2
    val before = idx.dedupBatch(probe, "id", "text")
      .select($"corpus_id").as[Long].collect().toSet
    assert(before == Set(2L))
    assert(idx.vacuum(keepLast = 2) == 2, "epochs 0+1 (docs 1, 2) fold")
    assert(idx.maintenance().nDocs == 4L,
      "the fold's add row must carry the folded DOC count, not fp rows")
    assert(idx.dedupBatch(probe, "id", "text")
      .select($"corpus_id").as[Long].collect().toSet == Set(2L),
      "a folded document keeps matching through the vacuumed layouts")
  }
}

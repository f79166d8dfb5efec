package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EditIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val titles = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", substring($"text", 1, 30).as("title")).cache()

  test("dedupBatch equals editDistanceAgainst over the same split") {
    val corpus = titles.filter($"doc_id" < 400)
    val batch = titles.filter($"doc_id" >= 400)
    val idx = EditIndex.build(corpus, "doc_id", "title", tmp("graft_eidx"),
      maxEdits = 10)
    val inc = idx.dedupBatch(batch, "doc_id", "title")
      .as[(Long, Long, Long)].collect().toSet
    val direct = Dedup.editDistanceAgainst(batch, corpus, "doc_id", "title",
        maxEdits = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(inc == direct)
    assert(inc.nonEmpty, "testdata is known to contain near-title pairs")
  }

  test("ingestBatch: corpus typo dropped, within-batch dup dropped, cross-batch state") {
    val idx = EditIndex.build(
      Seq((1L, "the quick brown fox")).toDF("id", "title"),
      "id", "title", tmp("graft_eidx_ing"), maxEdits = 2)
    val b1 = idx.ingestBatch(
      Seq((10L, "the quick brown fax"),   // 1 edit from corpus doc 1
        (11L, "wholly different words"),
        (12L, "wholly different wordz")   // 1 edit from kept 11
      ).toDF("id", "title"), "id", "title")
      .select($"id").as[Long].collect().sorted
    assert(b1.toSeq == Seq(11L),
      "10 is a corpus typo; 12 duplicates kept lower-id 11")
    val b2 = idx.ingestBatch(
      Seq((20L, "wholly different wordy"), // 1 edit from batch-1 survivor 11
        (21L, "an unrelated headline")
      ).toDF("id", "title"), "id", "title")
      .select($"id").as[Long].collect().sorted
    assert(b2.toSeq == Seq(21L), "20 near-dups batch-1 survivor 11")
    val storedDocs = idx.storedTitles().select($"id").as[Long].collect().sorted
    assert(storedDocs.toSeq == Seq(1L, 11L, 21L),
      "dropped titles never appended")
  }

  test("load restores the radius; compaction preserves the match set") {
    val path = tmp("graft_eidx_cmp")
    val idx = EditIndex.build(
      Seq((1L, "alpha beta gamma")).toDF("id", "title"),
      "id", "title", path, maxEdits = 3)
    idx.append(Seq((2L, "delta epsilon zeta")).toDF("id", "title"),
      "id", "title")
    assert(EditIndex.load(spark, path).maxEdits == 3)
    def hits() = idx.dedupBatch(
      Seq((10L, "alpha beta gamm")).toDF("id", "title"), "id", "title")
      .select($"corpus_id").as[Long].collect().toSet
    val before = hits()
    idx.compact()
    assert(hits() == before && before == Set(1L))
    assert(idx.maintenance().nDocs == 2L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SegmentIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").cache()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Long)] =
    df.as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("incremental dedup equals corpus-wide keep-first restricted to the batch") {
    // every corpus id < every batch id, so in the corpus-wide operator every
    // corpus occurrence wins over every batch occurrence — the incremental
    // path must reproduce its batch rows EXACTLY
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = SegmentIndex.build(corpus, "doc_id", "text", tmp("graft_segidx"),
      delimiter = " ")
    val incr = rows(idx.dedupBatch(batch, "doc_id", "text"))
    val global = rows(Dedup.dedupParagraphs(corpus.unionAll(batch),
      "doc_id", "text", delimiter = " ").filter($"doc_id" >= 400))
    assert(incr == global)
    assert(incr.values.exists(_._2 > 0L),
      "testdata is known to contain cross-split repeated segments")
  }

  test("planted case: corpus hit, within-batch dup, floor-exempt segment") {
    val corpus = Seq((1L, "the quick fox")).toDF("id", "text")
    val batch = Seq(
      (10L, "a quick b b"), // "quick" in corpus; second "b" dups the first
      (11L, "a c")).toDF("id", "text") // "a" dups doc 10's; "c" fresh
    val idx = SegmentIndex.build(corpus, "id", "text", tmp("graft_segidx_mini"),
      delimiter = " ", minSegmentLen = 1)
    val got = rows(idx.dedupBatch(batch, "id", "text"))
    assert(got == Map(10L -> (("a b"), 2L), 11L -> (("c"), 1L)))
    // min floor: with the floor at 2, single-char segments are exempt
    val idx2 = SegmentIndex.build(corpus, "id", "text", tmp("graft_segidx_mini2"),
      delimiter = " ", minSegmentLen = 2)
    val got2 = rows(idx2.dedupBatch(batch, "id", "text"))
    assert(got2 == Map(10L -> (("a b b"), 1L), 11L -> (("a c"), 0L)),
      "single-char segments are floor-exempt; 'quick' still meets the " +
        "floor and drops against the corpus")
  }

  test("ingestBatch: later batches dedup against earlier survivors") {
    val corpus = Seq((1L, "alpha beta")).toDF("id", "text")
    val idx = SegmentIndex.build(corpus, "id", "text", tmp("graft_segidx_ing"),
      delimiter = " ")
    val b1 = rows(idx.ingestBatch(Seq((10L, "gamma beta delta")).toDF("id", "text"),
      "id", "text"))
    assert(b1 == Map(10L -> (("gamma delta"), 1L)), "beta was in the corpus")
    val b2 = rows(idx.ingestBatch(Seq((20L, "delta epsilon")).toDF("id", "text"),
      "id", "text"))
    assert(b2 == Map(20L -> (("epsilon"), 1L)),
      "delta survived batch 1 and must now be corpus state")
    assert(idx.maintenance().numEpochs == 3)
    // onCleaned (the sink seam) runs BEFORE the segment append: a sink
    // failure aborts the append (index unchanged → retry re-cleans against
    // the same state), and a successful sink observes the pre-append epoch
    // count — the at-least-once replay contract
    intercept[RuntimeException] {
      idx.ingestBatch(Seq((30L, "zeta eta")).toDF("id", "text"), "id", "text",
        onCleaned = _ => throw new RuntimeException("sink down"))
    }
    assert(idx.maintenance().numEpochs == 3,
      "a failed sink write must abort the segment append")
    var sawEpochs = -1
    val b3 = rows(idx.ingestBatch(Seq((30L, "zeta eta")).toDF("id", "text"),
      "id", "text", onCleaned = _ => sawEpochs = idx.maintenance().numEpochs))
    assert(b3 == Map(30L -> (("zeta eta"), 0L)))
    assert(sawEpochs == 3 && idx.maintenance().numEpochs == 4,
      "onCleaned observes the pre-append index; the append lands after")
  }

  test("a torn append is invisible; compact preserves results") {
    val corpus = docs.filter($"doc_id" < 200)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = SegmentIndex.build(corpus, "doc_id", "text", tmp("graft_segidx_at"),
      delimiter = " ")
    val before = rows(idx.dedupBatch(batch, "doc_id", "text"))
    idx.writeSlice(docs.filter($"doc_id" >= 200 && $"doc_id" < 400), "text",
      epoch = 1L) // crash before commit
    assert(rows(idx.dedupBatch(batch, "doc_id", "text")) == before,
      "uncommitted segment hashes must not drop anything")
    idx.append(docs.filter($"doc_id" >= 200 && $"doc_id" < 400), "doc_id", "text")
    val grown = rows(idx.dedupBatch(batch, "doc_id", "text"))
    val oneShot = SegmentIndex.build(docs.filter($"doc_id" < 400), "doc_id",
      "text", tmp("graft_segidx_at1"), delimiter = " ")
    assert(grown == rows(oneShot.dedupBatch(batch, "doc_id", "text")))
    idx.compact()
    assert(rows(idx.dedupBatch(batch, "doc_id", "text")) == grown)
    assert(idx.maintenance().numEpochs == 1)
  }
}

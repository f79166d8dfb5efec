package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FingerprintIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").cache()

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.as[(Long, Long, Double)].collect().toSet

  test("indexed batch dedup equals the recompute-everything operator") {
    val p = java.nio.file.Files.createTempDirectory("graft_fpidx").toString
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = FingerprintIndex.build(corpus, "doc_id", "text", p)
    val indexed = pairs(idx.dedupBatch(batch, "doc_id", "text", threshold = 0.5))
    val direct = pairs(Dedup.nearDupAgainstMinHash(corpus, batch,
      "doc_id", "text", threshold = 0.5))
    // hashed-shingle Jaccard == string-shingle Jaccard barring collisions
    assert(indexed == direct)
    assert(indexed.nonEmpty, "testdata is known to contain cross-split near-dups")
  }

  test("append is equivalent to building on the grown corpus") {
    val p = java.nio.file.Files.createTempDirectory("graft_fpidx_app").toString
    val idx = FingerprintIndex.build(docs.filter($"doc_id" < 200),
      "doc_id", "text", p)
    val n = idx.append(docs.filter($"doc_id" >= 200 && $"doc_id" < 400),
      "doc_id", "text")
    assert(n == 200L, "append reports the rows it fingerprinted")
    val batch = docs.filter($"doc_id" >= 400)
    val grown = pairs(idx.dedupBatch(batch, "doc_id", "text", threshold = 0.5))
    val oneShotPath = java.nio.file.Files.createTempDirectory("graft_fpidx_one").toString
    val oneShot = FingerprintIndex.build(docs.filter($"doc_id" < 400),
      "doc_id", "text", oneShotPath)
    assert(grown == pairs(oneShot.dedupBatch(batch, "doc_id", "text", 0.5)))
  }

  test("load restores the hash parameters as index state") {
    val p = java.nio.file.Files.createTempDirectory("graft_fpidx_load").toString
    FingerprintIndex.build(docs.filter($"doc_id" < 100), "doc_id", "text", p,
      shingleLen = 2, numHashes = 64, bands = 16, seed = 7L)
    val loaded = FingerprintIndex.load(spark, p)
    assert(loaded.shingleLen == 2 && loaded.numHashes == 64 &&
      loaded.bands == 16 && loaded.seed == 7L)
    // a loaded index searches identically to the in-memory handle
    val batch = docs.filter($"doc_id" >= 100 && $"doc_id" < 150)
    val viaLoad = pairs(loaded.dedupBatch(batch, "doc_id", "text", 0.5))
    val direct = pairs(Dedup.nearDupAgainstMinHash(
      docs.filter($"doc_id" < 100), batch, "doc_id", "text",
      shingleLen = 2, numHashes = 64, bands = 16, threshold = 0.5, seed = 7L))
    assert(viaLoad == direct)
  }

  test("dedupBatch never touches corpus text (reads the stored layouts only)") {
    val p = java.nio.file.Files.createTempDirectory("graft_fpidx_plan").toString
    val idx = FingerprintIndex.build(docs.filter($"doc_id" < 100),
      "doc_id", "text", p)
    val plan = idx.dedupBatch(docs.filter($"doc_id" >= 400),
        "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString()
    val scans = "graft_fpidx_plan[^ ,\\]]*".r.findAllIn(plan).toSeq
    assert(scans.nonEmpty, s"expected stored-layout scans in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no product join:\n$plan")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dir-bucketed verify layout (`gatherBuckets`): the fat layouts
  * ([[FingerprintIndex]] shingle-hash docs, [[HyperplaneIndex]] vecs) write
  * under `gb = pmod(id, B)` partition directories so candidate gathers can
  * prune DIRECTORIES — the byte-level term the flat layout could not reach
  * when candidate ids spread uniformly (Spark pushes >10-value IN filters
  * to parquet as one global min/max range, which skips nothing at uniform
  * spread; a partition-column IN prunes at file listing). Results must be
  * bit-identical to the flat layout in every lifecycle state: fresh build,
  * multi-epoch append, online ingest, compaction, reload.
  */
class GatherBucketSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").cache()

  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding").cache()

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_gb_$tag").toString

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.as[(Long, Long, Double)].collect().toSet

  private def gbDirs(layoutDir: String): Set[String] =
    new java.io.File(layoutDir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("gb=")).toSet

  test("writeLayoutSlice: bucketed slice lands under gb= dirs, flat stays flat") {
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "payload")
    val flat = tmp("flat"); val bucketed = tmp("buck")
    EpochIndex.writeLayoutSlice(df, s"$flat/epoch=0", buckets = 0)
    EpochIndex.writeLayoutSlice(df, s"$bucketed/epoch=0", buckets = 8)
    assert(gbDirs(flat).isEmpty)
    assert(gbDirs(bucketed) == (0 until 8).map(b => s"gb=$b").toSet)
    val back = spark.read.parquet(s"$bucketed/epoch=0")
    assert(back.columns.toSet == Set("id", "payload", "gb"))
    assert(back.select($"id").as[Long].collect().toSet == (0L until 100L).toSet)
    // the partition value IS pmod(id, B) — the gather filter's contract
    assert(back.filter($"gb" =!= pmod($"id", lit(8))).count() == 0)
  }

  test("gatherPruned with buckets: dir predicate prunes, rows identical") {
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "payload")
    val p = tmp("prune")
    EpochIndex.writeLayoutSlice(df, s"$p/epoch=0", buckets = 8)
    val stored = spark.read.parquet(s"$p/epoch=0")
    val cands = Seq(3L, 11L, 3L).toDF("corpus_id") // both land in gb=3
    val pruned = EpochIndex.gatherPruned(stored, cands, "corpus_id",
      corpusRows = 1000L, minCorpus = 100L, gatherBuckets = 8)
    assert(pruned.select($"id").as[Long].collect().toSet == Set(3L, 11L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]*gb".r.findFirstIn(plan).nonEmpty,
      s"the bucket set must reach the scan as a partition filter:\n$plan")
  }

  test("fingerprint index: bucketed results equal flat across build/append/compact/load") {
    val corpus1 = docs.filter($"doc_id" < 200)
    val corpus2 = docs.filter($"doc_id" >= 200 && $"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val flat = FingerprintIndex.build(corpus1, "doc_id", "text", tmp("fp_flat"))
    val bPath = tmp("fp_buck")
    val buck = FingerprintIndex.build(corpus1, "doc_id", "text", bPath,
      gatherBuckets = 8)
    assert(gbDirs(s"$bPath/docs").nonEmpty, "docs layout must be bucketed")
    assert(gbDirs(s"$bPath/bands").isEmpty, "slim bands layout stays flat")
    flat.append(corpus2, "doc_id", "text")
    buck.append(corpus2, "doc_id", "text")
    val expect = pairs(flat.dedupBatch(batch, "doc_id", "text", 0.5))
    assert(expect.nonEmpty)
    assert(pairs(buck.dedupBatch(batch, "doc_id", "text", 0.5)) == expect)
    // the at-scale path: gather prune forced on, bucket predicate active
    val prunedDf = buck.dedupBatch(batch, "doc_id", "text", 0.5,
      gatherPruneMinCorpus = 0L)
    assert(pairs(prunedDf) == expect)
    val plan = prunedDf.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*gb".r.findFirstIn(plan).nonEmpty,
      s"bucketed gather must push a gb partition filter:\n$plan")
    buck.compact()
    assert(gbDirs(s"$bPath/docs").nonEmpty, "compaction must keep the bucketing")
    assert(pairs(buck.dedupBatch(batch, "doc_id", "text", 0.5)) == expect)
    val loaded = FingerprintIndex.load(spark, bPath)
    assert(loaded.gatherBuckets == 8, "gatherBuckets is persisted index state")
    assert(pairs(loaded.dedupBatch(batch, "doc_id", "text", 0.5)) == expect)
  }

  test("fingerprint index: bucketed online ingest equals flat, incl. empty epochs") {
    def run(gb: Int): (Set[Long], Set[Long], Long) = {
      val idx = FingerprintIndex.build(docs.filter($"doc_id" < 300),
        "doc_id", "text", tmp(s"fp_ing$gb"), gatherBuckets = gb)
      val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 450)
      val b2 = docs.filter($"doc_id" >= 450)
      val k1 = idx.ingestBatch(b1, "doc_id", "text", 0.5)
        .select($"doc_id").as[Long].collect().toSet
      val k2 = idx.ingestBatch(b2, "doc_id", "text", 0.5)
        .select($"doc_id").as[Long].collect().toSet
      // replay b1: everything matches its own appended copy -> empty epoch
      // (for the bucketed layout: a partitioned write with zero rows — the
      // mixed bucketed/empty epoch roots must still read back)
      assert(idx.ingestBatch(b1, "doc_id", "text", 0.5).count() == 0)
      // force a verify-layout read SPANNING the empty epoch: the replay's
      // kept-nothing append must not poison later storedDocs() scans
      val again = idx.dedupBatch(b1, "doc_id", "text", 0.5)
        .select($"batch_id").distinct().count()
      assert(again == b1.count(), "every replayed doc matches its stored copy")
      (k1, k2, idx.maintenance().nDocs)
    }
    val (f1, f2, fN) = run(0)
    val (b1, b2, bN) = run(8)
    assert(b1 == f1 && b2 == f2 && bN == fN)
  }

  test("hyperplane index: bucketed results equal flat; load restores the knob") {
    val corpus = vecs.filter($"vec_id" < 400)
    val batch = vecs.filter($"vec_id" >= 400)
    val flat = HyperplaneIndex.build(corpus, "vec_id", "embedding",
      tmp("hp_flat"), dim = 64, nBits = 128)
    val bPath = tmp("hp_buck")
    val buck = HyperplaneIndex.build(corpus, "vec_id", "embedding", bPath,
      dim = 64, nBits = 128, gatherBuckets = 8)
    assert(gbDirs(s"$bPath/vecs").nonEmpty, "vecs layout must be bucketed")
    val expect = pairs(flat.dedupBatch(batch, "vec_id", "embedding", 0.9))
    assert(pairs(buck.dedupBatch(batch, "vec_id", "embedding", 0.9)) == expect)
    val prunedDf = buck.dedupBatch(batch, "vec_id", "embedding", 0.9,
      gatherPruneMinCorpus = 0L)
    assert(pairs(prunedDf) == expect)
    val plan = prunedDf.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*gb".r.findFirstIn(plan).nonEmpty,
      s"bucketed gather must push a gb partition filter:\n$plan")
    val loaded = HyperplaneIndex.load(spark, bPath)
    assert(loaded.gatherBuckets == 8)
    assert(pairs(loaded.dedupBatch(batch, "vec_id", "embedding", 0.9)) == expect)
  }

  test("hyperplane online ingest on a bucketed index equals flat (multi-probe on)") {
    def run(gb: Int): (Set[Long], Set[Long], Long) = {
      val idx = HyperplaneIndex.build(vecs.filter($"vec_id" < 300),
        "vec_id", "embedding", tmp(s"hp_ing$gb"), dim = 64, nBits = 128,
        gatherBuckets = gb)
      val b1 = vecs.filter($"vec_id" >= 300 && $"vec_id" < 400)
      val b2 = vecs.filter($"vec_id" >= 400)
      val k1 = idx.ingestBatch(b1, "vec_id", "embedding", 0.9, probeFlips = 1)
        .select($"vec_id").as[Long].collect().toSet
      val k2 = idx.ingestBatch(b2, "vec_id", "embedding", 0.9, probeFlips = 1)
        .select($"vec_id").as[Long].collect().toSet
      (k1, k2, idx.maintenance().nDocs)
    }
    val (f1, f2, fN) = run(0)
    val (b1, b2, bN) = run(8)
    assert(b1 == f1 && b2 == f2 && bN == fN)
  }

  test("pre-gather-bucket meta (no gather_buckets column) loads as flat") {
    // write the OLD meta schema by hand next to a freshly built flat index:
    // load must default to 0 rather than fail or misread
    val p = tmp("fp_oldmeta")
    FingerprintIndex.build(docs.filter($"doc_id" < 100), "doc_id", "text", p,
      shingleLen = 2, numHashes = 64, bands = 16, seed = 7L)
    Seq((2, 64, 16, 7L)).toDF("shingle_len", "num_hashes", "bands", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
    val loaded = FingerprintIndex.load(spark, p)
    assert(loaded.gatherBuckets == 0)
    assert(loaded.dedupBatch(docs.filter($"doc_id" >= 100 && $"doc_id" < 150),
      "doc_id", "text", 0.5).columns.toSeq ==
      Seq("batch_id", "corpus_id", "jaccard"))
  }
}

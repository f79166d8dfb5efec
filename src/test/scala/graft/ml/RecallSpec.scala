package graft.ml

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall-harness unit coverage plus the PRODUCTION k-means IVF recall sweep
  * (the fixed-quantizer twin is oracle-checked end to end as q46; this spec
  * measures the index users actually build, and its numbers feed the README
  * recall table).
  */
class RecallSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("recallAtK: per-query hit fractions, missed queries get recall 0") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("query_id", "id")
    // q1 finds 2 of 3 (plus a non-truth extra), q2 finds none
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L), (2L, 98L), (2L, 97L), (2L, 96L))
      .toDF("query_id", "id")
    val rows = Recall.recallAtK(approx, exact).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((2L, 3L, 2.0 / 3.0)))
    assert(rows(2L) == ((0L, 3L, 0.0)))
    val s = Recall.summarize(Recall.recallAtK(approx, exact)).head()
    assert(s.getLong(0) == 2L && s.getLong(1) == 6L && s.getDouble(2) == 2.0 / 6.0)
  }

  test("recallAtK ignores duplicate and extra approx rows") {
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "id")
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 50L), (9L, 10L)).toDF("query_id", "id")
    val r = Recall.recallAtK(approx, exact).collect()
    assert(r.length == 1) // only queries present in exact
    assert(r.head.getLong(1) == 1L && r.head.getLong(2) == 2L)
  }

  test("pairRecall: fraction of truth pairs recovered") {
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val found = Seq((1L, 2L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Recall.pairRecall(found, truth).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getDouble(2) == 2.0 / 3.0)
  }

  test("k-means IVF recall@10 sweep: monotone in nProbe, exactly 1.0 at full probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vector"))
    val p = java.nio.file.Files.createTempDirectory("graft_recall_sweep").toString
    val idx = IvfIndex.build(emb, "id", "vector", p, nLists = 16)
    val queries = emb.filter($"id" < 32)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val exact = idx.searchBatch(queries, k = 10, nProbe = 16) // full probe = exact
    val sweep = Seq(1, 2, 4, 8, 16).map { np =>
      val approx = idx.searchBatch(queries, k = 10, nProbe = np)
      val s = Recall.summarize(Recall.recallAtK(approx, exact)).head()
      np -> s.getDouble(2)
    }
    info(s"k-means IVF recall@10 (nLists=16, 32 queries, sf0.001): " +
      sweep.map { case (np, r) => f"nProbe=$np -> $r%.3f" }.mkString(", "))
    // a probed superset's top-k can only gain exact-top-k members
    sweep.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(a <= b + 1e-12, s"recall not monotone: nProbe=$npA -> $a, nProbe=$npB -> $b")
    }
    assert(sweep.last._2 == 1.0, s"full probe must be exact, got ${sweep.last._2}")
    assert(sweep.head._2 > 1.0 / 16, "nProbe=1 should beat the random-probe floor")
  }

  test("LSH pair recall vs exact twin is 1.0 on the planted-copy corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val copies = emb.select(($"vec_id" + 10000).as("vec_id"),
      transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    val corpus = emb.unionAll(copies)
    val found = Dedup.embeddingNearDupLsh(corpus, "vec_id", "embedding",
      threshold = 0.9, dim = 64)
    val truth = Dedup.embeddingNearDupExact(corpus, "vec_id", "embedding",
      threshold = 0.9)
    val r = Recall.pairRecall(found, truth).head()
    assert(r.getLong(0) == 500L, s"expected 500 planted truth pairs, got ${r.getLong(0)}")
    assert(r.getDouble(2) == 1.0, s"deterministic recall must be 1.0, got ${r.getDouble(2)}")
    // WIDE geometry (128 bits / 8 bands = 16-bit buckets, two signature
    // words): planted scaled copies share every word's signs, so recall
    // stays deterministic while buckets sharpen 256x
    val foundWide = Dedup.embeddingNearDupLsh(corpus, "vec_id", "embedding",
      threshold = 0.9, dim = 64, nBits = 128)
    val rw = Recall.pairRecall(foundWide, truth).head()
    assert(rw.getDouble(2) == 1.0,
      s"wide-signature recall on planted copies must be 1.0, got ${rw.getDouble(2)}")
  }
}

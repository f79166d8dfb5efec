package graft.ml

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding").cache()

  // planted copies: x2 scaling preserves cosine (and cluster assignment)
  // exactly, so ground truth is deterministic
  private lazy val corpus = emb.unionAll(emb.select(
    ($"vec_id" + 10000).as("vec_id"),
    transform($"embedding", x => x * lit(2.0f)).as("embedding"))).cache()

  private lazy val cents = emb.filter($"vec_id" < 8).orderBy($"vec_id")
    .as[(Long, Seq[Float])].collect().map(_._2.map(_.toDouble).toArray)

  test("fixed-centroid pairs equal the exact all-pairs twin on planted copies") {
    val got = SemDedup.pairsWithCentroids(corpus, "vec_id", "embedding",
        cents, threshold = 0.9)
      .as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingNearDupExact(corpus, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(got == exact, "cluster-scoped search must find every planted pair")
    assert(got == (0L until 500L).map(i => (i, i + 10000)).toSet)
  }

  test("pair search joins on cluster id, never cross-joins") {
    val plan = SemDedup.pairsWithCentroids(corpus, "vec_id", "embedding",
        cents, threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"semantic dedup must not cross-join:\n$plan")
  }

  test("cluster cap keeps lowest ids deterministically") {
    val got = SemDedup.pairsWithCentroids(corpus, "vec_id", "embedding",
        cents, threshold = 0.9, maxClusterSize = 50)
      .as[(Long, Long)].collect().toSet
    val again = SemDedup.pairsWithCentroids(corpus, "vec_id", "embedding",
        cents, threshold = 0.9, maxClusterSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(got == again)
    // capped clusters can only LOSE pairs relative to uncapped
    val full = SemDedup.pairsWithCentroids(corpus, "vec_id", "embedding",
        cents, threshold = 0.9)
      .as[(Long, Long)].collect().toSet
    assert(got.subsetOf(full) && got.size < full.size)
  }

  test("withSemDedupFlags keeps one representative per semantic set") {
    val flagged = SemDedup.withSemDedupFlags(corpus, "vec_id", "embedding",
      threshold = 0.9, nClusters = 8)
    assert(flagged.count() == 1000)
    val kept = flagged.filter($"keep").select($"vec_id")
      .as[Long].collect().toSet
    assert(kept.size == 500)
    // lowest id of each planted set is the original
    assert(kept == (0L until 500L).toSet)
  }
}

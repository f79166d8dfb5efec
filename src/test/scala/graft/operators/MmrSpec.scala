package graft.operators

import graft.SparkSpec
import graft.functions.vector
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversified retrieval: degeneracy to plain top-k at lambda = 1,
  * redundancy suppression on a planted two-cluster corpus, deterministic
  * tie-break, and the candidate cap guard.
  *
  * Geometry note: diversity only pays when a candidate's similarity to the
  * SELECTED set is smaller than its similarity to the query — a second
  * cluster sitting mirror-opposite the first across the query axis, not a
  * cluster on the query itself (there, penalty == relevance and MMR
  * rightly prefers the relevant twin). The fixture plants exactly that:
  * A = {1,2,3} at +26 deg off the query in the xy-plane (mutually
  * near-identical), B = {10,11} at -27 deg (relevance within ~1% of A,
  * cos(A,B) ~ 0.60), C = {20} orthogonal.
  */
class MmrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def v(x: Double, y: Double, z: Double, w: Double) =
    Seq(x.toFloat, y.toFloat, z.toFloat, w.toFloat)
  private lazy val corpus = Seq(
    (1L, v(0.9, 0.436, 0, 0.001)),
    (2L, v(0.9, 0.436, 0, 0.002)),
    (3L, v(0.9, 0.436, 0, 0.003)),
    (10L, v(0.85, -0.436, 0, 0)),
    (11L, v(0.85, -0.436, 0, 0.001)),
    (20L, v(0, 0, 1.0, 0))
  ).toDF("id", "vec").cache()
  private val query = Seq(1.0, 0.0, 0.0, 0.0)

  test("lambda = 1 degenerates to plain top-k order") {
    val mmr = Mmr.searchMmr(corpus, "id", "vec", query,
      k = 4, fetchN = 6, lambda = 1.0)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    val topk = Knn.topK(corpus, query, k = 4, vecCol = "vec")
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(mmr == topk)
  }

  test("diversity: second pick crosses to the mirror cluster, twins sink") {
    val picks = Mmr.searchMmr(corpus, "id", "vec", query,
      k = 4, fetchN = 6, lambda = 0.5)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    // plain top-4 = 1,2,3,10; MMR: best A row, then the best B row (the
    // near-twins of 1 carry penalty ~1 for ~1e-4 of extra relevance),
    // then the orthogonal outlier beats every remaining near-twin
    assert(picks.head == 1L)
    assert(Set(10L, 11L).contains(picks(1)), s"second pick should diversify: $picks")
    assert(picks(2) == 20L, s"penalty-free outlier beats the twins: $picks")
    assert(picks.take(3).toSet.intersect(Set(2L, 3L)).isEmpty,
      s"redundant near-twins of the first pick must not crowd the top: $picks")
  }

  test("exact duplicates: lower id first, the copy sinks behind diversity") {
    val dup = Seq(
      (5L, v(1.0, 0, 0, 0)), (4L, v(1.0, 0, 0, 0)), (10L, v(0.3, 1.0, 0, 0))
    ).toDF("id", "vec")
    // query tilted toward 10 so its relevance strictly exceeds its penalty
    // against the first pick — the copy (marginal exactly 0) then loses
    val picks = Mmr.searchMmr(dup, "id", "vec", Seq(1.0, 0.1, 0.0, 0.0),
      k = 3, fetchN = 3, lambda = 0.5)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(picks == Seq(4L, 10L, 5L), s"got $picks")
  }

  test("metric plumbing: dot-product penalty and relevance") {
    // dot relevance ties the A cluster at 0.9 -> id 1 on the tie-break;
    // the B cluster's dot penalty against 1 (~0.57) is well under its
    // relevance contribution, so 10 follows
    val picks = Mmr.searchMmr(corpus, "id", "vec", query,
      k = 2, fetchN = 6, lambda = 0.5, metric = vector.MetricDot)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 10L), s"got $picks")
  }

  test("cap guard: more candidates than maxCandidates fails fast") {
    val e = intercept[IllegalArgumentException] {
      Mmr.rerank(corpus.withColumn("rel", org.apache.spark.sql.functions.lit(1.0)),
        "id", "vec", "rel", k = 2, lambda = 0.5, maxCandidates = 3)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  test("retrieveContextMmr: threshold, MMR order, greedy length prefix") {
    // relevance precomputed (cosine to the query); lengths force the cap
    // to cut inside the MMR order, and the threshold drops the outlier
    val cand = Seq(
      (1L, v(0.9, 0.436, 0, 0.001), 40L),
      (2L, v(0.9, 0.436, 0, 0.002), 40L),
      (10L, v(0.85, -0.436, 0, 0), 50L),
      (20L, v(0, 0, 1.0, 0), 10L)
    ).toDF("id", "vec", "len")
      .withColumn("rel",
        graft.functions.vector.cosine_sim($"vec",
          org.apache.spark.sql.functions.typedLit(query)))
    val got = Mmr.retrieveContextMmr(cand, "id", "vec", "rel", "len",
      minSimilarity = 0.1, maxContextLength = 95L, k = 4, lambda = 0.5)
      .select($"id", $"rank").as[(Long, Long)].collect().toSeq
    // eligible = {1, 2, 10} (20 is below threshold); MMR order = 1, 10, 2
    // (mirror cluster first); running lengths 40, 90, 130 -> 2 overflows
    assert(got == Seq((1L, 1L), (10L, 2L)), s"got $got")
  }

  test("k exceeding the candidate count returns every candidate once") {
    val picks = Mmr.searchMmr(corpus, "id", "vec", query,
      k = 10, fetchN = 10, lambda = 0.7)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(picks.length == 6 && picks.toSet.size == 6)
  }
}

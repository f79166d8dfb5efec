package graft.operators

import graft.SparkSpec
import graft.functions.vector
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md F1/F2/F3 invariants (mirroring tests/test_integration.py and
  * tests/demo.py of the reference).
  */
class KnnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val dim = 32

  // F1-style store: 100 rows, meta carries id/content_hash/source.
  private lazy val store = (0 until 100).map { i =>
    (i.toLong,
      Seq.fill(dim)(rnd.nextFloat()),
      Map("id" -> s"doc_$i", "content_hash" -> s"hash_$i", "source" -> "test"))
  }.toDF("id", "vector", "meta").cache()

  private lazy val row0Vec: Seq[Double] =
    store.filter($"id" === 0).select($"vector").head().getSeq[Float](0).map(_.toDouble)

  test("F1: self-query rank-1 is the row itself with similarity > 0.999") {
    val res = Knn.topK(store, row0Vec, k = 5).collect()
    assert(res.length == 5)
    val top = res.head
    assert(top.getAs[Long]("id") == 0L)
    assert(top.getAs[Double]("similarity_score") > 0.999)
    assert(top.getAs[Int]("rank") == 1)
    val scores = res.map(_.getAs[Double]("similarity_score"))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), "scores must be descending")
  }

  test("F1: content_hash filter with k=1 returns exactly doc_10") {
    val res = Knn.topK(store, row0Vec, k = 1,
      metadataFilter = Map("content_hash" -> "hash_10")).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Map[String, String]]("meta")("id") == "doc_10")
  }

  // F2-style store: category/priority/lang metadata.
  private lazy val f2Store = (0 until 20).map { i =>
    (i.toLong,
      Seq.fill(16)(rnd.nextFloat()),
      Map(
        "id" -> s"doc_$i",
        "category" -> (if (i < 10) "A" else "B"),
        "priority" -> (i % 3).toString,
        "lang" -> (if (i % 2 == 0) "de" else "en")))
  }.toDF("id", "vector", "meta").cache()

  private lazy val f2Query: Seq[Double] =
    f2Store.filter($"id" === 3).select($"vector").head().getSeq[Float](0).map(_.toDouble)

  test("F2: category filter returns only category A") {
    val res = Knn.topK(f2Store, f2Query, k = 20, metadataFilter = Map("category" -> "A"))
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Map[String, String]]("meta")("category") == "A"))
  }

  test("F2: conjunctive filter priority=1 AND lang=en") {
    val res = Knn.topK(f2Store, f2Query, k = 20,
      metadataFilter = Map("priority" -> "1", "lang" -> "en")).collect()
    assert(res.nonEmpty)
    assert(res.forall { r =>
      val m = r.getAs[Map[String, String]]("meta")
      m("priority") == "1" && m("lang") == "en"
    })
  }

  test("F2: filter with no matches returns 0 rows, not an error") {
    val res = Knn.topK(f2Store, f2Query, k = 5, metadataFilter = Map("category" -> "C"))
    assert(res.count() == 0)
  }

  test("F3: batch query — each query's rank-1 is itself; both impls agree") {
    val queries = store.filter($"id" < 3)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val agg = Knn.batchTopK(queries, store, k = 2).collect()
    val win = Knn.batchTopKWindow(queries, store, k = 2).collect()

    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("id")))
        .sortBy(t => (t._1, t._2))

    assert(key(agg).sameElements(key(win)), "aggregator and window variants must agree")
    assert(agg.length == 6)
    val rank1 = agg.filter(_.getAs[Long]("rank") == 1L)
    assert(rank1.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("id")),
      "rank-1 hit of a stored query vector must be itself")
  }

  test("euclidean and dot_product metrics rank self first") {
    for (m <- Seq(vector.MetricEuclidean, vector.MetricDot)) {
      val res = Knn.topK(store, row0Vec, k = 3, metric = m).collect()
      if (m == vector.MetricEuclidean)
        assert(res.head.getAs[Long]("id") == 0L, s"metric $m should rank self first")
      assert(res.length == 3)
    }
  }

  test("labelConstrainedTopK: hard negatives exclude the anchor's label entirely") {
    // 2D geometry: anchor (1,0) label 0; same-label lookalike (0.99,0.1);
    // other-label rows at decreasing similarity
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.99f, 0.1f), 0),
      (2L, Array(0.9f, 0.3f), 1), (3L, Array(0.5f, 0.8f), 1),
      (4L, Array(0f, 1f), 2)
    ).toDF("id", "vector", "label")
    val qs = emb.filter($"id" === 0).select(
      $"id".as("query_id"), $"vector".as("query_vec"), $"label".as("query_label"))
    val neg = Knn.labelConstrainedTopK(qs, emb, k = 2, sameLabel = false)
      .select($"id", $"rank").as[(Long, Long)].collect().sortBy(_._2)
    // nearest other-label rows: 2 then 3; rows 0/1 (label 0) never appear
    assert(neg.toSeq == Seq((2L, 1L), (3L, 2L)))
  }

  test("labelConstrainedTopK: hard positives keep the label and drop the anchor row") {
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.99f, 0.1f), 0),
      (2L, Array(0.7f, 0.7f), 0), (3L, Array(0.9f, 0.3f), 1)
    ).toDF("id", "vector", "label")
    val qs = emb.filter($"id" === 0).select(
      $"id".as("query_id"), $"vector".as("query_vec"), $"label".as("query_label"))
    val pos = Knn.labelConstrainedTopK(qs, emb, k = 5, sameLabel = true)
      .select($"id", $"rank").as[(Long, Long)].collect().sortBy(_._2)
    // the anchor itself (id 0) is excluded even though it is cosine-1
    assert(pos.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("labelConstrainedTopK plans the batchTopK shape: broadcast queries, partial top-k, no window") {
    val emb = (0L until 50L).map(i => (i, Array(i.toFloat, 1f), (i % 3).toInt))
      .toDF("id", "vector", "label")
    val qs = emb.limit(2).select(
      $"id".as("query_id"), $"vector".as("query_vec"), $"label".as("query_label"))
    val p = Knn.labelConstrainedTopK(qs, emb, k = 3, sameLabel = false)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastNestedLoopJoin"), s"queries must broadcast:\n$p")
    assert(!p.contains("Window"), s"mining must not window-rank:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the bounded-aggregator two-phase plan:\n$p")
  }

  test("retrieveContext respects min_similarity and max_context_length") {
    val ranked = Seq(
      (1L, 0.9, 100L), (2L, 0.8, 100L), (3L, 0.7, 100L), (4L, 0.2, 10L)
    ).toDF("id", "similarity_score", "chunk_length")
    val res = Knn.retrieveContext(ranked, minSimilarity = 0.5,
      maxContextLength = 250, k = 10, lengthCol = "chunk_length").collect()
    assert(res.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
  }

  test("assignNearestCentroid: one row per input, best centroid, id-asc tie-break") {
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(1f, 1f))
    ).toDF("id", "vec")
    val cents = Seq((10L, Array(1f, 0f)), (20L, Array(0f, 1f)))
      .toDF("cid", "cvec")
    val out = Knn.assignNearestCentroid(df, "id", "vec", cents, "cid", "cvec")
      .select($"id", $"centroid_id").as[(Long, Long)].collect().sortBy(_._1)
    // id=3 is equidistant -> lowest centroid id wins
    assert(out.toSeq == Seq((0L, 10L), (1L, 20L), (2L, 10L), (3L, 10L)))
  }

  test("marginTopK: neighborhood-normalized margin re-ranks and demotes nothing unfairly") {
    // q0=(1,0), q1=(0,1); store axis-aligned + two diagonals
    val qs = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("query_id", "query_vec")
    val st = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0.6f, 0.8f)),
      (12L, Array(0f, 1f)), (13L, Array(0.8f, 0.6f))
    ).toDF("id", "vector")
    val out = Knn.marginTopK(qs, st, k = 2)
      .select($"query_id", $"id", $"margin", $"rnk")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    // forward top-2: q0 -> {s10 cos 1.0, s13 cos 0.8}, dx = 0.9
    // reverse: dy(s10) = (1+0)/2 = 0.5, dy(s13) = (0.8+0.6)/2 = 0.7
    // margins: s10 = 1/0.7 ~ 1.4286, s13 = 0.8/0.8 = 1.0
    assert(out.map(r => (r._1, r._2, r._4)).toSeq ==
      Seq((0L, 10L, 1L), (0L, 13L, 2L), (1L, 12L, 1L), (1L, 11L, 2L)))
    assert(math.abs(out(0)._3 - 1.0 / 0.7) < 1e-6)
    assert(math.abs(out(1)._3 - 1.0) < 1e-6)
  }

  test("marginTopK: the margin demotes a hub that raw cosine ranks first") {
    // hub h is moderately close to BOTH queries (dense neighborhood);
    // t is slightly less close to q0 but isolated from everything else
    val qs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.4359f, 0f)),
      (2L, Array(0.9f, 0f, 0.4359f))
    ).toDF("query_id", "query_vec")
    val st = Seq(
      (10L, Array(0.95f, 0.2205f, 0.2205f)), // hub: close to every query
      (11L, Array(0.93f, 0f, -0.3676f))      // target: close only to q0
    ).toDF("id", "vector")
    val raw = Knn.batchTopK(qs, st, k = 2)
      .filter($"query_id" === 0 && $"rank" === 1)
      .select($"id").as[Long].head()
    val marg = Knn.marginTopK(qs, st, k = 2)
      .filter($"query_id" === 0 && $"rnk" === 1)
      .select($"id").as[Long].head()
    assert(raw == 10L, "precondition: raw cosine must prefer the hub")
    assert(marg == 11L, "margin must demote the hub and surface the isolated match")
  }
}

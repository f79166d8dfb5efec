package graft.operators

import graft.SparkSpec
import graft.functions.vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlockedKnnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id".as("id"), $"embedding".as("vector")).cache()

  private lazy val queries = emb.filter($"id" < 12)
    .select($"id".as("query_id"), $"vector".as("query_vec"))

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id", $"rank", $"id", round($"similarity_score", 9))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("blocked batch kNN agrees exactly with the expression path (all metrics)") {
    for (m <- Seq(vector.MetricCosine, vector.MetricEuclidean, vector.MetricDot)) {
      val a = key(Knn.batchTopK(queries, emb, k = 7, metric = m))
      val b = key(Knn.batchTopKBlocked(queries, emb, k = 7, metric = m))
      assert(a == b, s"metric $m mismatch")
    }
  }

  test("blocked path handles k larger than the store") {
    val tiny = emb.limit(3)
    val r = Knn.batchTopKBlocked(queries.limit(2), tiny, k = 10)
    assert(r.count() == 6) // 2 queries x 3 rows available
  }

  test("query-set cap: over-cap set fails fast, at-cap set runs") {
    val all = emb.select($"id".as("query_id"), $"vector".as("query_vec"))
    val e = intercept[IllegalArgumentException] {
      Knn.batchTopKBlocked(all, emb, k = 3, maxQueries = 100)
    }
    assert(e.getMessage.contains("batchTopKBlocked"), e.getMessage)
    assert(e.getMessage.contains("100"), e.getMessage)
    // exactly at the cap is fine
    val ok = Knn.batchTopKBlocked(all.limit(100), emb, k = 3, maxQueries = 100)
    assert(ok.select($"query_id").distinct().count() == 100)
  }
}

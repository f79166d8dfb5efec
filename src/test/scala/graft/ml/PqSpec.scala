package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id".as("id"), $"embedding".as("vector"))
    .cache()

  test("encode: hand-computed codes on a 2-subspace toy codebook") {
    // M=2, K=2, subDim=2; codebook m0: {(0,0), (1,1)}, m1: {(0,1), (5,5)}
    val model = ProductQuantizer.PqModel(2, 2, 2,
      Array(0.0, 0.0, 1.0, 1.0, /* m1 */ 0.0, 1.0, 5.0, 5.0))
    val df = Seq(
      (1L, Seq(0.1f, 0.1f, 4.0f, 4.0f)), // m0 -> k0, m1 -> k1
      (2L, Seq(0.9f, 0.8f, 0.0f, 0.9f))) // m0 -> k1, m1 -> k0
      .toDF("id", "vector")
    val codes = ProductQuantizer.encode(df, "id", "vector", model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == Seq(0, 1))
    assert(codes(2L) == Seq(1, 0))
  }

  test("encode ties keep the lowest codebook entry") {
    // two identical centroids: strict < must keep k=0
    val model = ProductQuantizer.PqModel(1, 2, 2, Array(3.0, 3.0, 3.0, 3.0))
    val codes = Seq((1L, Seq(9.0f, 9.0f))).toDF("id", "vector")
      .transform(ProductQuantizer.encode(_, "id", "vector", model))
      .as[(Long, Seq[Int])].head()
    assert(codes._2 == Seq(0))
  }

  test("batch ADC top-k equals a driver-side brute-force replay") {
    val model = ProductQuantizer.fixedModel(emb, "id", "vector", 8, 16)
    val codes = ProductQuantizer.encode(emb, "id", "vector", model)
    val queries = emb.filter($"id" >= 100 && $"id" < 104)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val got = ProductQuantizer.searchBatchAdc(codes, queries, model, k = 5)
      .select($"query_id", $"id", $"rank").as[(Long, Long, Long)]
      .collect().toSet

    // brute force: decode nothing — recompute codes and ADC in plain Scala
    val all = emb.as[(Long, Seq[Float])].collect()
    val codeMap = codes.as[(Long, Seq[Int])].collect().toMap
    val qs = queries.as[(Long, Seq[Float])].collect()
    val expect = qs.flatMap { case (qid, qv) =>
      val scored = all.map { case (id, _) =>
        val cs = codeMap(id)
        var d = 0.0
        for (m <- 0 until model.numSubspaces) {
          val cent = model.centroid(m, cs(m))
          var j = 0
          while (j < model.subDim) {
            val diff = qv(m * model.subDim + j).toDouble - cent(j)
            d += diff * diff
            j += 1
          }
        }
        (id, d)
      }
      scored.sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, id, (i + 1).toLong) }
    }.toSet
    assert(got == expect)
  }

  test("fail-fast query cap, dim validation") {
    val model = ProductQuantizer.fixedModel(emb, "id", "vector", 8, 16)
    val codes = ProductQuantizer.encode(emb, "id", "vector", model)
    val queries = emb.limit(5)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.searchBatchAdc(codes, queries, model, k = 3, maxQueries = 4)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("trained codebooks cut mean distortion vs fixed row-sampled ones") {
    def distortion(model: ProductQuantizer.PqModel): Double = {
      val codes = ProductQuantizer.encode(emb, "id", "vector", model)
      emb.join(codes, Seq("id")).as[(Long, Seq[Float], Seq[Int])]
        .collect().map { case (_, v, cs) =>
          var d = 0.0
          for (m <- 0 until model.numSubspaces) {
            val cent = model.centroid(m, cs(m))
            var j = 0
            while (j < model.subDim) {
              val diff = v(m * model.subDim + j).toDouble - cent(j)
              d += diff * diff
              j += 1
            }
          }
          d
        }.sum / 500.0
    }
    val fixed = ProductQuantizer.fixedModel(emb, "id", "vector", 8, 16)
    val trained = ProductQuantizer.train(emb, "id", "vector", 8, 16, maxIter = 5)
    val (df0, dt) = (distortion(fixed), distortion(trained))
    info(f"PQ mean squared distortion: fixed=$df0%.4f trained=$dt%.4f")
    assert(dt < df0, s"k-means codebooks ($dt) must beat row samples ($df0)")
  }

  test("ADC rerank recovers exact-cosine top-k better than raw ADC") {
    val model = ProductQuantizer.train(emb, "id", "vector", 8, 16, maxIter = 5)
    val codes = ProductQuantizer.encode(emb, "id", "vector", model)
    val queries = emb.filter($"id" < 16)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    // exact cosine truth via the blocked kNN path
    val exact = graft.operators.Knn.batchTopK(queries, emb.toDF(), k = 10)
      .select($"query_id", $"id")
    val adc = ProductQuantizer.searchBatchAdc(codes, queries, model, k = 10)
      .select($"query_id", $"id")
    val reranked = ProductQuantizer.searchRerankBatch(
      codes, emb.toDF(), queries, model, k = 10, overFetch = 4)
      .select($"query_id", $"id")
    val rAdc = Recall.summarize(Recall.recallAtK(adc, exact)).head().getDouble(2)
    val rRer = Recall.summarize(Recall.recallAtK(reranked, exact)).head().getDouble(2)
    info(f"PQ recall@10 vs exact cosine: adc=$rAdc%.3f reranked=$rRer%.3f")
    assert(rRer >= rAdc, "re-rank must not lose recall")
    assert(rRer > 0.5, s"re-ranked recall $rRer unreasonably low")
  }
}

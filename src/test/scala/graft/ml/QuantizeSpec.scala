package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("int8 codes are clamped, symmetric, and reproducible") {
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero vector -> zero codes
    ).toDF("id", "v")
    val out = Quantize.quantized(df, "v")
      .select($"id", $"codes").as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(127L, -127L, 64L, 0L))  // floor(0.5*127+0.5)=64
    assert(out(2L) == Seq(0L, 0L, 0L, 0L))
    assert(out.values.flatten.forall(c => c >= -127 && c <= 127))
  }

  test("searchRerank top-10 matches exact cosine kNN on testdata") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = emb.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0)
    val got = Quantize.searchRerank(emb, "vec_id", "embedding", qv, k = 5)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    // exact top-5 for vec_id=0 self-query (cross-checked Spark vs DuckDB)
    assert(got == Seq(0L, 17L, 225L, 12L, 483L),
      s"quantize+rerank must recover the exact top-5, got $got")
  }

  test("quantized candidate recall@10 is high against exact kNN") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = emb.filter($"vec_id" === 7).select($"embedding").head.getSeq[Float](0)
    val quant = Quantize.search(emb, "vec_id", "embedding", qv, k = 10)
      .select($"id").as[Long].collect().toSet
    val exact = emb
      .select($"vec_id".cast("long").as("id"),
        graft.functions.vector.cosine_sim($"embedding", typedLit(qv)).as("s"))
      .orderBy($"s".desc, $"id".asc).limit(10)
      .select($"id").as[Long].collect().toSet
    val recall = (quant & exact).size.toDouble / 10.0
    assert(recall >= 0.8, s"int8 recall@10 too low: $recall")
  }
}

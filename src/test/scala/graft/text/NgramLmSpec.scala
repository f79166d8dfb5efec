package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").cache()

  private lazy val model = NgramLm.train(docs.filter($"doc_id" < 400), "text")

  test("hand-computed perplexity on a tiny corpus") {
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val m = NgramLm.train(tiny, "text", k = 1.0, minBigramCount = 1L)
    // counts: a=3, b=2, c=1, T=6, V=3; bigrams: "a b"=2, "a c"=1
    assert(m.vocabSize == 3 && m.totalTokens == 6)
    // doc "a b": P(a)=(3+1)/(6+3)=4/9; P(b|a)=(2+1)/(3+3)=1/2
    // H = -(log2(4/9)+log2(1/2))/2 ; ppl = 2^H = sqrt(9/4 * 2) = sqrt(4.5)
    val ppl = tiny.filter($"id" === 1)
      .select(NgramLm.perplexity($"text", m)).head().getDouble(0)
    assert(math.abs(ppl - math.sqrt(4.5)) < 1e-12, s"got $ppl")
  }

  test("in-domain held-out docs score far lower than out-of-vocabulary junk") {
    val heldOut = docs.filter($"doc_id" >= 400)
      .select(NgramLm.perplexity($"text", model).as("p"))
      .agg(avg($"p")).head().getDouble(0)
    val junk = (0 until 50)
      .map(i => (i.toLong, s"zzq$i xkv$i qqj$i wvx$i zzq$i mmk$i"))
      .toDF("doc_id", "text")
      .select(NgramLm.perplexity($"text", model).as("p"))
      .agg(avg($"p")).head().getDouble(0)
    info(f"perplexity: in-domain held-out=$heldOut%.1f oov junk=$junk%.1f")
    assert(heldOut * 10 < junk,
      s"junk ($junk) must score much higher than in-domain ($heldOut)")
  }

  test("filterByPerplexity is a pure no-shuffle filter and keeps in-domain docs") {
    val filtered = NgramLm.filterByPerplexity(docs, "text", model,
      maxPerplexity = 1000.0)
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"perplexity filter must not shuffle:\n$plan")
    assert(filtered.count() > 400, "most corpus docs are in-domain")
  }

  test("empty and whitespace-only text score 0 (no evidence, never NaN)") {
    val edge = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
      .select(NgramLm.perplexity($"text", model).as("p"))
      .as[Double].collect()
    assert(edge.toSeq == Seq(0.0, 0.0))
  }
}

package graft.text

import graft.SparkSpec
import graft.functions.BpeUtil
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the classic Sennrich dict; counts chosen so merge order is hand-checkable
  private val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromDict learns the hand-computed merge sequence") {
    val model = BpeTokenizer.trainFromDict(dict, numMerges = 4)
    // pair counts round 1: (e,s)=9 ties (s,t</w>)=9 -> lexicographically
    // smallest wins; then (es,t</w>)=9; then (l,o)=7; then the 6-count tie
    // (e,w)/(n,e)/(w,est</w>) -> (e,w)
    assert(model.merges == Seq(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
  }

  test("segmentation applies merges in priority order") {
    val model = BpeTokenizer.trainFromDict(dict, numMerges = 4)
    val out = Seq((1L, "lowest low"), (2L, ""))
      .toDF("id", "text")
      .select($"id", BpeTokenizer.bpeTokens($"text", model).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    // lowest: e+s -> es, es+t</w> -> est</w>, l+o -> lo => [lo, w, est</w>]
    // low:    l+o -> lo                               => [lo, w</w>]
    assert(out(1L) == Seq("lo", "w", "est</w>", "lo", "w</w>"))
    assert(out(2L) == Seq.empty)
  }

  test("round trip: concatenated symbols reconstruct the words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val model = BpeTokenizer.train(docs, "text", numMerges = 64)
    val rows = docs
      .select($"doc_id", $"text", BpeTokenizer.bpeTokens($"text", model).as("toks"))
      .as[(Long, String, Seq[String])].collect()
    rows.foreach { case (id, text, toks) =>
      val rebuilt = toks.mkString("")
        .split(java.util.regex.Pattern.quote(BpeUtil.EndOfWord), -1)
        .filter(_.nonEmpty).mkString(" ")
      val expected = text.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == expected, s"doc $id")
    }
  }

  test("bpeTokenCount matches segment size; more merges never increase tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(100).cache()
    val small = BpeTokenizer.train(docs, "text", numMerges = 16)
    val large = BpeTokenizer.train(docs, "text", numMerges = 128)
    val counts = docs.select(
        BpeTokenizer.bpeTokenCount($"text", small).as("c_small"),
        size(BpeTokenizer.bpeTokens($"text", small)).cast("long").as("s_small"),
        BpeTokenizer.bpeTokenCount($"text", large).as("c_large"))
      .as[(Long, Long, Long)].collect()
    counts.foreach { case (cs, ss, cl) =>
      assert(cs == ss, "count kernel must equal segment size")
      assert(cl <= cs, "more merges must not increase token count")
    }
  }

  test("tokenBudget aggregates per source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val model = BpeTokenizer.train(docs, "text", numMerges = 64)
    val budget = BpeTokenizer.tokenBudget(docs, "source", "text", model)
      .as[(String, Long, Long)].collect()
    assert(budget.map(_._2).sum == 500)
    assert(budget.forall(_._3 > 0))
    // spot-check one source against a direct sum
    val (src, nDocs, nToks) = budget.head
    val direct = docs.filter($"source" === src)
      .select(sum(BpeTokenizer.bpeTokenCount($"text", model)))
      .head().getLong(0)
    assert(nToks == direct && nDocs > 0)
  }
}

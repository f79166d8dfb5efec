package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("tokenEntropy: hand-computed values, degenerate and uniform extremes") {
    val docs = Seq(
      (1L, "a a a a"),              // one token: H = 0
      (2L, "a b c d"),              // uniform over 4: H = ln(4)
      (3L, "a a b b b c"),          // 2/6, 3/6, 1/6
      (4L, ""),                     // no tokens at all: H = 0
      (5L, "  a b  c d ")           // stray spaces are NOT tokens (LM parity)
    ).toDF("id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def h(ps: Seq[Double]): Long =
      math.floor(ps.map(p => -p * math.log(p)).sum * 10000 + 0.5).toLong
    assert(got(1L) == ((4L, 1L, 0L)))
    assert(got(2L) == ((4L, 4L, h(Seq(0.25, 0.25, 0.25, 0.25)))))
    assert(got(3L) == ((6L, 3L,
      h(Seq(2.0 / 6, 3.0 / 6, 1.0 / 6))))) // fold order by token: a,b,c
    assert(got(4L) == ((0L, 0L, 0L)))
    assert(got(5L) == got(2L), "empty tokens must not shift the histogram")
    // the diversity signal orders as designed: degenerate < mixed < uniform
    assert(got(1L)._3 < got(3L)._3 && got(3L)._3 < got(2L)._3)
  }

  test("tokenEntropy plans zero exchanges (per-row kernel)") {
    val docs = Seq((1L, "a b a")).toDF("id", "text")
    val p = TextAnalysis.tokenEntropy(docs, "id", "text")
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"entropy must not shuffle:\n$p")
  }

  test("stopwordRatio kernel is value-identical to the declarative filter") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Seq("", "the the THE", "no stops here", "der die und the")
      .toDF("text").unionAll(docs.select($"text"))
    val stops = TextAnalysis.StopwordProfiles("en")
    val toks = TextAnalysis.tokens($"text")
    val declarative = size(filter(toks, t => t.isin(stops: _*))).cast("double") /
      greatest(size(toks), lit(1))
    val mismatches = corpus
      .select(TextAnalysis.stopwordRatio(toks, stops).as("fast"),
        declarative.as("slow"))
      .filter(not($"fast" <=> $"slow"))
      .count()
    assert(mismatches == 0L, "CountInSet diverges from the interpreted filter")
  }

  test("chunkText: short text is a single identity chunk") {
    assert(TextAnalysis.chunkText("hello world", 100, 10) == Seq("hello world"))
  }

  test("chunkText: plain text tiles with stride = size - overlap") {
    val text = "abcdefghij" * 10 // 100 chars, no sentence boundaries
    val chunks = TextAnalysis.chunkText(text, 30, 10)
    // stride 20: starts 0,20,40,60,80 -> 5 chunks
    assert(chunks.length == 5)
    assert(chunks.head == text.substring(0, 30))
    assert(chunks(1) == text.substring(20, 50))
    assert(chunks.last == text.substring(80, 100))
  }

  test("chunkText: breaks at sentence boundary when >70% of window kept") {
    // window 40; ". " at ~75% of the window
    val text = "a" * 30 + ". " + "b" * 40 + ". " + "c" * 20
    val chunks = TextAnalysis.chunkText(text, 40, 0)
    // first window [0,40): last ". " at idx 30 > 28 (0.7*40) -> chunk = first 32 chars trimmed
    assert(chunks.head == "a" * 30 + ".")
  }

  test("chunkText: boundary below 70% threshold is ignored") {
    val text = "a" * 10 + ". " + "b" * 60
    val chunks = TextAnalysis.chunkText(text, 40, 0)
    assert(chunks.head == ("a" * 10 + ". " + "b" * 28)) // full window, no break
  }

  test("chunks(): explodes documents with reference metadata shape") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val c = TextAnalysis.chunks(docs, "doc_id", "text", chunkSize = 60, overlap = 10)
    assert(c.columns.toSeq ==
      Seq("document_id", "chunk_index", "chunk_text", "chunk_length"))
    assert(c.count() > docs.count(), "128-char docs at size 60 must multi-chunk")
    // chunk_index is dense from 0 per document
    val bad = c.groupBy($"document_id")
      .agg(min($"chunk_index").as("mn"), max($"chunk_index").as("mx"), count(lit(1)).as("n"))
      .filter($"mn" =!= 0 || $"mx" =!= $"n" - 1).count()
    assert(bad == 0)
  }

  test("languageId picks en for english, de for german") {
    val df = Seq(
      "the cat sat on the mat and it was happy for a while",
      "der hund und die katze sind nicht mit dem ball zu spielen").toDF("t")
      .select(TextAnalysis.languageId($"t").as("l"))
    val langs = df.select($"l.lang").collect().map(_.getString(0)).toSeq
    assert(langs == Seq("en", "de"))
  }

  test("script detection: zh/ja/ko by character ranges (stopwords are blind to them)") {
    // non-ASCII fixtures are safe here because build.sbt pins -encoding
    // UTF-8 (the production char classes still use \u escapes outright)
    val zh = "今天天气很好我们一起去"
    val ja = "日本の経済は成長している" // kanji + kana mix
    val ko = "한국어 문장입니다"

    val mixed = s"the model 模型 was trained on 数据 yesterday"
    val en = "the cat sat on the mat and it was happy"
    val df = Seq(zh, ja, ko, mixed, en).toDF("t")
    val got = df.select(TextAnalysis.languageId($"t").as("l"))
      .select($"l.lang", $"l.confidence").collect()
    assert(got(0).getString(0) == "zh" && got(0).getDouble(1) > 0.9)
    assert(got(1).getString(0) == "ja", "kanji+kana must be ja, not zh")
    assert(got(2).getString(0) == "ko")
    assert(got(3).getString(0) != "zh", "minor CJK presence must not flip the label")
    assert(got(4).getString(0) == "en")
    // staged form agrees with the Column form on BOTH lang and confidence
    val staged = TextAnalysis.withLanguageId(df, "t")
      .select($"lang", $"confidence").collect()
    assert(staged.map(_.getString(0)).toSeq == got.map(_.getString(0)).toSeq)
    assert(staged.map(_.getDouble(1)).toSeq == got.map(_.getDouble(1)).toSeq)
  }

  test("script threshold is strictly greater-than at the 0.3 boundary") {
    // exactly 3 kanji in 10 chars = 0.30: NOT > 0.3, stays latin-scored
    val boundary = "一丁丂 abcdef"
    assert(boundary.length == 10)
    val lang = Seq(boundary).toDF("t")
      .select(TextAnalysis.languageId($"t").as("l"))
      .select($"l.lang").head().getString(0)
    assert(lang != "zh", "ratio == threshold must not trigger script label")
  }

  test("token counts: whitespace and BPE-ish regex") {
    val df = Seq("Hello, world! It's 42.").toDF("t")
    val ws = df.select(TextAnalysis.tokenCount($"t")).head().getLong(0)
    val rx = df.select(TextAnalysis.regexTokenCount($"t")).head().getLong(0)
    assert(ws == 4)
    // Hello , world ! It ' s 42 . -> 9 pieces
    assert(rx == 9, s"got $rx")
  }

  test("qualityScore: prose scores higher than junk") {
    val df = Seq(
      "The quick brown fox jumps over the lazy dog. It was a sunny day in the park.",
      "ZZZZ!!!! @@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))").toDF("t")
      .select(TextAnalysis.qualityScore($"t").as("q"))
    val scores = df.select($"q.quality").collect().map(_.getDouble(0))
    assert(scores(0) > scores(1), s"prose ${scores(0)} should beat junk ${scores(1)}")
  }

  test("fingerprint md5 matches expected hex") {
    val fp = Seq("abc").toDF("t")
      .select(TextAnalysis.fingerprint($"t").as("f"))
      .select($"f.md5").head().getString(0)
    assert(fp == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("topTokensPerKey: exact counts, cnt-desc token-asc rank, k bound") {
    val df = Seq(
      (1L, "en", "b b b a a c"),
      (2L, "en", "a d"),          // en totals: a=3 b=3 c=1 d=1
      (3L, "de", "x")
    ).toDF("id", "lang", "text")
    val out = TextAnalysis.topTokensPerKey(df, "lang", "text", k = 3)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._4))
    // ties (a,b)@3 break token-asc; (c,d)@1 break to c at rank 3
    assert(out.filter(_._1 == "en").toSeq ==
      Seq(("en", "a", 3L, 1L), ("en", "b", 3L, 2L), ("en", "c", 1L, 3L)))
    // a key with fewer distinct tokens than k returns them all, no padding
    assert(out.filter(_._1 == "de").toSeq == Seq(("de", "x", 1L, 1L)))
  }

  test("topTokensPerKey: empty tokens from whitespace runs never surface") {
    val df = Seq((1L, "en", "  a   b  ")).toDF("id", "lang", "text")
    val toks = TextAnalysis.topTokensPerKey(df, "lang", "text", k = 10)
      .select($"token").as[String].collect().toSet
    assert(toks == Set("a", "b"))
  }

  test("topTokensPerKey plans a partial-aggregated top-k, not a window funnel") {
    val df = Seq((1L, "en", "a b c")).toDF("id", "lang", "text")
    val plan = TextAnalysis.topTokensPerKey(df, "lang", "text", k = 5)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"),
      s"per-key top-k must use the bounded aggregator, not a window rank:\n$plan")
    // the typed aggregator runs as a two-phase ObjectHashAggregate (or
    // SortAggregate fallback): partial top-k before the lang shuffle
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed-aggregator two-phase plan:\n$plan")
  }

  test("tfIdfTopTerms: rare terms outrank common ones, ties break on term") {
    // 'rare' appears in 1 of 3 docs, 'common' in all 3: in doc 1 both have
    // tf=1 but idf(rare) > idf(common). Doc 2's doubled common term beats
    // its single rare term only if 2*idf(common) > idf(rare) — with N=3:
    // idf(rare) = ln(4/2)+1 = 1.693, idf(common) = ln(4/4)+1 = 1.0 -> 2.0
    // beats 1.693.
    val df = Seq(
      (1L, "rare common"),
      (2L, "common common other"),
      (3L, "common misc")
    ).toDF("id", "text")
    val out = TextAnalysis.tfIdfTopTerms(df, "id", "text", k = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._4))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == Seq("rare", "common"))
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq("common", "other"))
    assert(out.forall(_._4 <= 2), "rank bounded by k")
    // empty terms never surface; a doc with no terms is absent
    val e = TextAnalysis.tfIdfTopTerms(
      Seq((1L, "  a"), (2L, "")).toDF("id", "text"), "id", "text", k = 5)
      .as[(Long, String, Long, Long)].collect()
    assert(e.map(_._2).forall(_.nonEmpty))
    assert(!e.exists(_._1 == 2L), "a doc of only empty tokens is absent")
  }

  test("pmiBigrams: exact counts and the fixed-association pmi double") {
    val df = Seq("a b", "a b", "a c").toDF("text")
    val out = TextAnalysis.pmiBigrams(df, "text", minCount = 2)
      .select($"gram", $"w_a", $"w_b", $"n_pair", $"n_a", $"n_b", $"lift", $"pmi")
      .as[(String, String, String, Long, Long, Long, Double, Double)].collect()
    // unigrams: a=3 b=2 c=1 (total 6); bigrams: "a b"=2 "a c"=1 (total 3)
    assert(out.length == 1)
    val r = out.head
    assert(r._1 == "a b" && r._2 == "a" && r._3 == "b")
    assert((r._4, r._5, r._6) == (2L, 3L, 2L))
    // lift = (np*Nu*Nu) / ((Nb*na)*nb) = 72/18 = 4, IEEE-exact; pmi = ln 4
    assert(r._7 == 4.0)
    assert(r._8 == math.log(4.0))
  }

  test("pmiBigrams: high-count low-pmi boilerplate ranks below a true collocation") {
    val boiler = Seq.fill(20)("the cat sat") ++ Seq.fill(20)("the dog ran") ++
      Seq.fill(5)("san francisco")
    val out = TextAnalysis.pmiBigrams(boiler.toDF("text"), "text", minCount = 5)
      .select($"gram", $"pmi").as[(String, Double)].collect().toMap
    assert(out("san francisco") > out("the cat"),
      "a dedicated collocation must out-PMI a boilerplate pair")
  }
}

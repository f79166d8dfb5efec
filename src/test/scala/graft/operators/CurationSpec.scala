package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("tokenNgrams: sliding windows, short docs yield empty") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val out = df.select($"id", Curation.tokenNgrams($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
  }

  test("tokenNgrams kernel is byte-equivalent to the declarative formula") {
    // duplicates kept, first-to-last order, empties from repeated spaces,
    // unicode, and the empty-array short-doc contract
    def declarative(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ", -1)
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = Seq("", " ", "a", "a b a b a b", "x  y", "東京 日本 東京 日本 kyoto")
      .toDF("text").unionAll(docs.select($"text"))
    for (n <- Seq(1, 2, 8)) {
      val mismatches = corpus
        .select(Curation.tokenNgrams($"text", n).as("fast"),
          declarative($"text", n).as("slow"))
        .filter(not($"fast" <=> $"slow"))
        .count()
      assert(mismatches == 0L, s"kernel diverges from declarative formula at n=$n")
    }
  }

  test("decontaminate flags exactly the docs sharing an n-gram") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no overlap at all here"),
      (3L, "we said the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    val bench = Seq((100L, "xx the quick brown fox jumps over the lazy dog yy"))
      .toDF("id", "text")
    val out = Curation.decontaminate(corpus, bench, "id", "text", ngramLen = 8)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._3).toSeq ==
      Seq(1L -> true, 2L -> false, 3L -> true))
    // doc 1 contains "the quick...dog" as grams 1..3 of the 10-token text;
    // the benchmark's distinct 8-grams overlapping it: positions given both
    // texts share the 9-token core => hits > 0 and bounded by gram count
    assert(out.forall(r => r._2 >= 0 && r._2 <= 3))
  }

  test("decontaminateBloom: row-identical to exact decontaminate, even " +
      "with a deliberately undersized filter (false positives verified away)") {
    val rnd = new scala.util.Random(17)
    def doc(): String = Seq.fill(20)(s"w${rnd.nextInt(40)}").mkString(" ")
    val planted = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = ((1L to 60L).map(i => (i, doc())) :+
      (61L, s"prefix $planted suffix")).toDF("id", "text")
    val bench = Seq((100L, s"xx $planted yy"), (101L, doc()))
      .toDF("id", "text")
    val exact = Curation.decontaminate(corpus, bench, "id", "text", ngramLen = 8)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(exact.count(_._3) >= 1, "the planted leak must be flagged")
    val bloom = Curation.decontaminateBloom(
      corpus, bench, "id", "text", ngramLen = 8)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(bloom == exact, "bloom tier must be row-identical")
    // 64-bit filter over ~60 bench grams: false-positive rate is large by
    // construction; exactness must survive because survivors are verified
    val tiny = Curation.decontaminateBloom(
      corpus, bench, "id", "text", ngramLen = 8,
      expectedGrams = 4L, numBits = 64L)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(tiny == exact, "an undersized filter costs verify rows, never answers")
    // empty benchmark: all clean
    val clean = Curation.decontaminateBloom(
      corpus, bench.filter($"id" < 0), "id", "text", ngramLen = 8)
      .as[(Long, Long, Boolean)].collect()
    assert(clean.length == 61 && clean.forall(r => r._2 == 0L && !r._3))
  }

  test("decontaminateByBenchmark attributes hits per eval set; shared grams hit both") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no overlap at all here"),
      (3L, "we said the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    val bench = Seq(
      (100L, "xx the quick brown fox jumps over the lazy dog yy", "evalA"),
      // evalB repeats evalA's core: the shared grams attribute to BOTH
      (101L, "zz the quick brown fox jumps over the lazy dog ww", "evalB"),
      (102L, "no overlap here either honestly truly never once more", "evalC")
    ).toDF("id", "text", "bench")
    val out = Curation.decontaminateByBenchmark(
      corpus, bench, "id", "text", "bench", ngramLen = 8)
      .as[(Long, String, Long)].collect().toSet
    assert(out.map(r => (r._1, r._2)) ==
      Set((1L, "evalA"), (1L, "evalB"), (3L, "evalA"), (3L, "evalB")),
      s"got $out")
    assert(out.forall(_._3 > 0), "inner-join semantics: only positive hits")
    // per-benchmark counts agree with the unlabeled operator on one bench
    val solo = Curation.decontaminate(corpus,
      bench.filter($"bench" === "evalA"), "id", "text", ngramLen = 8)
      .filter($"hits" > 0).as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(out.filter(_._2 == "evalA").map(r => (r._1, r._3)) == solo)
  }

  test("contaminatedSpans: overlapping matches merge into maximal islands") {
    // corpus doc 1 tokens: [we said the quick brown fox jumps over the lazy dog today]
    //                        0   1   2    3     4    5    6    7   8   9   10   11
    // bench 4-grams cover "the quick brown fox" (2..5) and "over the lazy dog"
    // (7..10); gram matches at p=2,3 overlap and merge into span 2..6
    val corpus = Seq(
      (1L, "we said the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no overlap at all here")
    ).toDF("id", "text")
    val bench = Seq((100L, "xx the quick brown fox jumps yy over the lazy dog zz"))
      .toDF("id", "text")
    val out = Curation.contaminatedSpans(corpus, bench, "id", "text", ngramLen = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // bench 4-grams include "the quick brown fox", "quick brown fox jumps",
    // "over the lazy dog" -> doc 1 matches at p=2,3 (covering 2..6) and p=7
    // (covering 7..10): positions 2..10 chain into ONE maximal span
    assert(out.toSeq == Seq((1L, 2L, 10L, 9L)), s"got ${out.toSeq}")
  }

  test("redactSpans cuts exactly the spanned tokens; clean docs byte-identical") {
    val corpus = Seq(
      (1L, "a b c d e f g"),
      (2L, "untouched text here"),
      (3L, "x y z")).toDF("id", "text")
    val spans = Seq((1L, 1L, 2L), (1L, 5L, 5L), (3L, 0L, 2L))
      .toDF("id", "span_start", "span_end")
    val out = Curation.redactSpans(corpus, spans, "id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a d e g", 3L),       // cut b,c (1-2) and f (5)
      (2L, "untouched text here", 0L),
      (3L, "", 3L)),             // fully covered
      s"got ${out.toSeq}")
  }

  test("decontaminate: gram broadcast hint is size-gated; fallback matches exactly") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no overlap at all here"),
      (3L, "we said the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    val bench = Seq((100L, "xx the quick brown fox jumps over the lazy dog yy"))
      .toDF("id", "text")
    val expect = Curation.decontaminate(corpus, bench, "id", "text", ngramLen = 8)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // kill auto-broadcast so only the explicit hint could broadcast: the
    // cap=0 leg must then plan a SHUFFLED join (the huge-benchmark path)
    // and still produce identical rows
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fb = Curation.decontaminate(corpus, bench, "id", "text",
        ngramLen = 8, maxBroadcastGrams = 0L)
      val got = fb.as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == expect, "fallback path must not change results")
      val p = fb.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"cap=0 must suppress the explicit broadcast hint:\n$p")
      val hinted = Curation.decontaminate(corpus, bench, "id", "text", ngramLen = 8)
      hinted.collect()
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "under the cap the explicit hint must broadcast even with auto-broadcast off")
      val fbFrac = Curation.decontaminateFraction(corpus, bench, "id", "text",
        ngramLen = 8, maxFrac = 0.5, maxBroadcastGrams = 0L)
      val defFrac = Curation.decontaminateFraction(corpus, bench, "id", "text",
        ngramLen = 8, maxFrac = 0.5)
      assert(fbFrac.collect().sortBy(_.getLong(0)).toSeq ==
        defFrac.collect().sortBy(_.getLong(0)).toSeq,
        "fraction fallback path must not change results")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("leakageSafeSplit: clusters stay whole; singletons draw on their own id") {
    val df = (1L to 100L).map(i => Tuple1(i)).toDF("id")
    // two clusters: {1,2,3} (chained) and {10, 11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Curation.leakageSafeSplit(df, pairs, "id")
      .as[(Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size == 1,
      "cluster {1,2,3} must share one split")
    assert(byId(10L)._3 == byId(11L)._3, "cluster {10,11} must share one split")
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).forall(_ == 1L), "group = min id")
    // ~80/10/10 at defaults over 100 rows (96 singleton clusters + 2)
    val counts = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(counts("train") > counts.getOrElse("validation", 0))
    assert(out.map(_._1).toSet == (1L to 100L).toSet, "every row assigned")
    intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(df, pairs, "id", trainPpm = 900000L,
        valPpm = 200000L)
    }
  }

  test("decontaminateSemantic: an over-cap benchmark fails fast, not OOM") {
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val bench = Seq.tabulate(5)(i => Tuple1(Array(i.toFloat, 1.0f))).toDF("vec")
    val e = intercept[IllegalArgumentException] {
      Curation.decontaminateSemantic(corpus, bench, "id", "vec", 0.5,
        maxBenchRows = 4L)
    }
    assert(e.getMessage.contains("maxBenchRows"))
    // at the cap exactly it still runs
    assert(Curation.decontaminateSemantic(corpus, bench, "id", "vec", 0.5,
      maxBenchRows = 5L).count() == 1L)
  }

  test("decontaminate includes clean docs with zero hits") {
    val corpus = Seq((5L, "just one tiny doc")).toDF("id", "text")
    val bench = Seq((9L, "something else entirely different words here now ok fine")).toDF("id", "text")
    val out = Curation.decontaminate(corpus, bench, "id", "text").collect()
    assert(out.length == 1 && out.head.getLong(1) == 0L)
  }

  test("weightedSample is a deterministic pure filter honoring rates") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val out = Curation.weightedSample(df, "id", "source", rates, defaultRate = 0.1)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out("src0") == 250)                  // rate 1.0 keeps everything
    assert(!out.contains("src2"))               // rate 0 drops everything
    assert(out("src1") > 75 && out("src1") < 175)   // ~125 of 250
    assert(out("src3") > 5 && out("src3") < 60)     // default 0.1 => ~25
    // deterministic: same result twice
    val again = Curation.weightedSample(df, "id", "source", rates, 0.1)
      .agg(sum("id")).head.getLong(0)
    val first = Curation.weightedSample(df, "id", "source", rates, 0.1)
      .agg(sum("id")).head.getLong(0)
    assert(again == first)
  }

  test("idHash is exact over the full 2^32 domain (no Long overflow wrap)") {
    // boundary ids around Long.MaxValue / 2654435761 ≈ 3.47e9, where the
    // naive one-multiply formula silently wraps, plus the domain edges
    val ids = Seq(0L, 1L, 12345L, 3472000000L, 3500000000L,
      4294967295L, 4294967296L, 8589934593L)
    val got = ids.toDF("id")
      .select($"id", Curation.idHash($"id").as("h"))
      .as[(Long, Long)].collect().toMap
    for (id <- ids) {
      val expect = ((BigInt(id) % BigInt(2L) .pow(32)) * BigInt(2654435761L) %
        BigInt(2L).pow(32)).toLong
      assert(got(id) == expect, s"idHash($id)")
      assert(got(id) >= 0 && got(id) < 4294967296L)
    }
  }

  test("weightedSample plans with no shuffle") {
    val df = (0L until 100L).map(i => (i, "s")).toDF("id", "source")
    val p = Curation.weightedSample(df, "id", "source", Map("s" -> 0.5))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  test("decontaminateSemantic: cosine hits counted, clean rows kept at zero") {
    // bench = the unit x-axis; corpus: an exact copy (cos 1), a scaled copy
    // (cos 1 — scale-invariant), an orthogonal vector (cos 0), an opposite
    // vector (cos -1), and a 45-degree vector (cos ~0.707)
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(5f, 0f)), (3L, Array(0f, 1f)),
      (4L, Array(-1f, 0f)), (5L, Array(1f, 1f))
    ).toDF("id", "vec")
    val bench = Seq((100L, Array(1f, 0f))).toDF("id", "vec")
    val out = Curation.decontaminateSemantic(corpus, bench, "id", "vec", 0.5)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, true), (3L, 0L, false),
      (4L, 0L, false), (5L, 1L, true)))
  }

  test("decontaminateSemantic: multiple benchmark matches accumulate; empty benchmark is all-clean") {
    val corpus = Seq((1L, Array(1f, 0f))).toDF("id", "vec")
    val bench = Seq((10L, Array(1f, 0f)), (11L, Array(2f, 0f)), (12L, Array(0f, 1f)))
      .toDF("id", "vec")
    val out = Curation.decontaminateSemantic(corpus, bench, "id", "vec", 0.9)
      .as[(Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq((1L, 2L, true)))
    val empty = Curation.decontaminateSemantic(
      corpus, bench.filter($"id" < 0), "id", "vec", 0.9)
      .as[(Long, Long, Boolean)].collect()
    assert(empty.toSeq == Seq((1L, 0L, false)))
  }

  test("decontaminateSemantic plans a broadcast compare — corpus vectors never exchange") {
    val corpus = (0L until 50L).map(i => (i, Array(i.toFloat, 1f))).toDF("id", "vec")
    val bench = Seq((100L, Array(1f, 0f))).toDF("id", "vec")
    val p = Curation.decontaminateSemantic(corpus, bench, "id", "vec", 0.5)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"benchmark side must broadcast:\n$p")
    // the only rows allowed into an exchange are slim (id, hits) pairs and
    // the id spine — never a row carrying the vector column
    val badExchange = p.linesIterator.zipWithIndex.exists { case (l, _) =>
      l.contains("Exchange") && l.contains("_cv") }
    assert(!badExchange, s"corpus vectors must not be exchanged:\n$p")
  }

  test("percentileGate: exact interpolated band on a known distribution") {
    // metric 1..10: p25 at position .25*9=2.25 -> 3.25; p75 -> 7.75
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "n")
    val out = Curation.percentileGate(df, "id", "n", 0.25, 0.75)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(4L, 5L, 6L, 7L))
  }

  test("percentileGate: full band keeps everything, degenerate band keeps the median value") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 7L)).toDF("id", "n")
    assert(Curation.percentileGate(df, "id", "n", 0.0, 1.0).count() == 3L)
    val med = Curation.percentileGate(df, "id", "n", 0.5, 0.5)
      .as[(Long, Long)].collect()
    assert(med.toSeq == Seq((1L, 5L), (2L, 5L))) // median of {5,5,7} is 5.0
    intercept[IllegalArgumentException] {
      Curation.percentileGate(df, "id", "n", 0.9, 0.1)
    }
  }

  test("percentileGate: corpus rows are filtered scan-side against a broadcast 1-row bound") {
    val df = (0L until 100L).map(i => (i, i % 37)).toDF("id", "n")
    val p = Curation.percentileGate(df, "id", "n", 0.05, 0.95)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"bounds must broadcast:\n$p")
  }

  test("repetitionStats measures duplicated tokens and bigrams") {
    val df = Seq(
      (1L, "a a a a"),              // 4 tokens, 1 distinct -> 0.75; grams "a a"x3 -> 2/3
      (2L, "w x y z"),              // all unique -> 0
      (3L, "")                      // 1 empty token, 0 grams
    ).toDF("id", "text")
    val out = Curation.repetitionStats(df, "id", "text", ngramLen = 2,
      dupNgramThreshold = 0.3)
      .as[(Long, Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 4L, 0.75, 2.0 / 3.0, true)))
    assert(out(1) == ((2L, 4L, 0.0, 0.0, false)))
    assert(out(2)._4 == 0.0)
  }

  test("removeBoilerplate drops planted header/footer lines, keeps content in order") {
    val header = "SITE NAV | home | products"
    val footer = "(c) example.com - all rights reserved"
    val docs = (0L until 10L).map { i =>
      val content = Seq(s"unique-$i alpha", s"unique-$i beta")
      val lines =
        (if (i < 8) Seq(header) else Seq.empty) ++ content ++
          (if (i < 6) Seq(footer) else Seq.empty)
      (i, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, "doc_id", "text",
        maxDocFrac = 0.5, delimiter = "\n")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // header in 8/10 docs and footer in 6/10 both exceed the 0.5 fraction
    out.foreach { case (i, cleaned, nRemoved) =>
      assert(cleaned == s"unique-$i alpha\nunique-$i beta", s"doc $i")
      val expected = (if (i < 8) 1 else 0) + (if (i < 6) 1 else 0)
      assert(nRemoved == expected, s"doc $i n_removed")
    }
  }

  test("removeBoilerplate: no frequent segments leaves text unchanged") {
    val docs = Seq((1L, "only\nlines\nhere"), (2L, "other\ncontent"))
      .toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "only\nlines\nhere", 0L)))
    assert(out(1) == ((2L, "other\ncontent", 0L)))
  }

  test("removeBoilerplate: fully-boilerplate doc empties; repeats count occurrences") {
    val docs = Seq(
      (1L, "spam"), (2L, "spam"), (3L, "spam\nspam\nkeep-me"))
      .toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, "doc_id", "text",
        maxDocFrac = 0.6, delimiter = "\n")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "", 1L)))
    assert(out(2) == ((3L, "keep-me", 2L)))
  }

  test("removeBoilerplate: df shuffle carries hashes, rewrite shuffles nothing") {
    val docs = (0L until 20L).map(i => (i, s"common\nrare-$i"))
      .toDF("doc_id", "text")
    val plan = Curation.removeBoilerplate(docs, "doc_id", "text",
        totalDocs = Some(20L))
      .queryExecution.executedPlan.toString()
    // rewrite phase is a pure projection over the docs scan — no Exchange
    assert(!plan.contains("Exchange"), s"rewrite must not shuffle:\n$plan")
  }

  test("removeBoilerplate fail-fast cap on the frequent-segment set") {
    val docs = Seq((1L, "a\nb"), (2L, "a\nb")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.removeBoilerplate(docs, "doc_id", "text",
        maxBoilerplateSegments = 1)
    }
    assert(e.getMessage.contains("maxBoilerplateSegments"))
  }

  test("trainOrder: reproducible permutation, dense per-shard positions, idHash shards") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Curation.trainOrder(df, "id", numShards = 8, seed = 3L)
      .as[(Long, Long, Long)].collect()
    assert(a.length == 1000 && a.map(_._1).toSet == (0L until 1000L).toSet,
      "output is a permutation manifest: every id exactly once")
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"positions in shard $shard must be dense 0-based")
    }
    val b = Curation.trainOrder(df, "id", numShards = 8, seed = 3L)
      .as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, "same seed, same order")
    val expectShard = df.select($"id",
        pmod(Curation.idHash($"id" + lit(3L)), lit(8L)))
      .as[(Long, Long)].collect().toMap
    a.foreach { case (id, shard, _) =>
      assert(shard == expectShard(id), s"shard of id $id") }
  }

  test("stratifiedTake: exactly n per big group, whole small group, brute-force parity") {
    // 3 sources: two with 200 rows, one with only 3
    val df = ((0L until 400L).map(i => (i, s"src${i % 2}")) ++
        Seq((1000L, "tiny"), (1001L, "tiny"), (1002L, "tiny")))
      .toDF("id", "src")
    val got = Curation.stratifiedTake(df, "id", "src", n = 10, seed = 2L)
      .as[(Long, String, Long)].collect()
    val bySrc = got.groupBy(_._2)
    assert(bySrc("src0").length == 10 && bySrc("src1").length == 10)
    assert(bySrc("tiny").length == 3, "groups under n keep every row")
    bySrc.values.foreach(rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "ranks are dense from 1"))
    // parity with the unpruned window semantics
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"src")
      .orderBy(Curation.idHash($"id" + lit(2L)), $"id")
    val brute = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 10).select($"id", $"src", $"rank")
      .as[(Long, String, Long)].collect()
    assert(got.sortBy(r => (r._2, r._3)).toSeq ==
      brute.sortBy(r => (r._2, r._3)).toSeq)
  }

  test("stratifiedTake: a group losing EVERY row to the cutoff raises, never vanishes") {
    // idHash is deterministic, so an adversarial id set CAN put a whole
    // group above the cutoff — build one by mirroring the hash in exact
    // BigInt arithmetic and keeping only above-cutoff ids
    val n = 1; val margin = 2.0; val gc = 200
    val cutoff = math.ceil((margin * n + 64.0) / gc * 4294967296.0).toLong
    def h(id: Long): Long =
      ((BigInt(id) % BigInt(4294967296L)) * BigInt(2654435761L) %
        BigInt(4294967296L)).toLong
    val badIds = Iterator.from(0).map(_.toLong).filter(h(_) >= cutoff)
      .take(gc).toSeq
    val okIds = (1000000L until 1000000L + gc).toSeq // ~2/3 survive the cutoff
    val df = (badIds.map((_, "bad")) ++ okIds.map((_, "ok"))).toDF("id", "src")
    val e = intercept[Exception] {
      Curation.stratifiedTake(df, "id", "src", n = n, margin = margin).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("kept too few rows in group bad"),
      s"expected the sentinel guard to fire, got: ${messages(e)}")
    // the guard must also survive COMPOSITION: a downstream join pushes
    // IsNotNull/key predicates into the carve's plan, which must not
    // detonate (or disable) the guard on healthy data — the union-branch
    // design this sentinel replaced failed exactly here
    val healthy = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val carved = Curation.stratifiedTake(healthy, "id", "src", n = 5)
    val joined = healthy.join(carved.select($"id"), Seq("id"), "left_anti")
    assert(joined.count() == 300L - 15L)
  }

  test("stratifiedTake is reproducible and seed-sensitive") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    def pick(seed: Long): Set[Long] =
      Curation.stratifiedTake(df, "id", "src", n = 7, seed = seed)
        .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(pick(4L) == pick(4L))
    assert(pick(4L) != pick(5L), "different seeds carve different sets")
  }

  test("decontaminateFraction: incidental overlap survives, near-copies skip") {
    val bench = Seq((0L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")).toDF("id", "text")
    val corpus = Seq(
      // one shared 8-gram inside a 20-token doc: 8/20 = 0.4, below 0.8
      (1L, "x1 x2 x3 x4 x5 x6 b1 b2 b3 b4 b5 b6 b7 b8 y1 y2 y3 y4 y5 y6"),
      // a near-copy: 10 bench tokens + 2 extra -> covered 10/12 = 0.833
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 z1 z2"),
      // overlapping matched grams must not double-count: tokens b1..b9
      // carry two overlapping shared 8-grams, coverage is 9 not 16
      (3L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (4L, "clean only tokens here nothing shared at all")).toDF("id", "text")
    val got = Curation.decontaminateFraction(corpus, bench, "id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(got(1L) == ((20L, 8L, false)), s"got ${got(1L)}")
    assert(got(2L) == ((12L, 10L, true)), s"got ${got(2L)}")
    assert(got(3L) == ((18L, 9L, false)),
      "two overlapping matched grams cover 9 distinct tokens, not 16")
    assert(got(4L) == ((8L, 0L, false)))
  }

  test("sampleToTokenBudget: over-budget sources sample down, under-budget keep all") {
    // src "big": 200 docs x 50 tokens = 10000 tokens; src "small": 10 docs
    val df = ((0L until 200L).map(i => (i, "big", 50L)) ++
        (1000L until 1010L).map(i => (i, "small", 50L)))
      .toDF("id", "src", "n_tok")
    val got = Curation.sampleToTokenBudget(df, "id", "src", "n_tok",
        targetTokens = 2000L)
      .as[(Long, String, Long)].collect()
    val bySrc = got.groupBy(_._2)
    assert(bySrc("small").length == 10, "under-budget sources keep every row")
    val bigTokens = bySrc("big").map(_._3).sum
    // rate = 0.2; hash sampling concentrates near the target
    assert(bigTokens > 1000L && bigTokens < 3000L,
      s"sampled 'big' tokens $bigTokens should be near the 2000 target")
    // monotone budgets: a larger target re-selects a superset (hash order
    // is stable — the weightedSample property, inherited)
    val more = Curation.sampleToTokenBudget(df, "id", "src", "n_tok",
        targetTokens = 5000L)
      .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(got.map(_._1).toSet.subsetOf(more))
  }

  test("sampleToTokenBudget: a NULL source fails fast, never falls to defaultRate") {
    val df = Seq((0L, Some("big"), 50L), (1L, None, 50L))
      .toDF("id", "src", "n_tok")
    val e = intercept[IllegalArgumentException] {
      Curation.sampleToTokenBudget(df, "id", "src", "n_tok", targetTokens = 10L)
    }
    assert(e.getMessage.contains("NULL value in source column"),
      s"got: ${e.getMessage}")
  }

  test("trainOrder: changing the seed re-mixes the epoch") {
    val df = spark.range(0, 500).toDF("id")
    def manifest(seed: Long): Map[Long, (Long, Long)] =
      Curation.trainOrder(df, "id", numShards = 4, seed = seed)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val e0 = manifest(0L); val e1 = manifest(1L)
    assert(e0 != e1, "different seeds must produce different permutations")
  }

  test("removeBoilerplate handles a 50k-entry frequent-segment set") {
    // membership is a single InSet over the hash set — an In with one
    // Literal per segment would stall driver-side analysis at this size
    // (and OOM near the 2^20 cap)
    val segs = (0 until 50000).map(i => s"boiler-$i")
    val body = segs.mkString("\n")
    val docs = Seq((1L, body + "\nunique-one"), (2L, body + "\nunique-two"))
      .toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, "doc_id", "text",
        maxDocFrac = 0.9, totalDocs = Some(2L))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq("unique-one", "unique-two"))
    assert(out.forall(_._3 == 50000L))
  }

  test("capPerKey: at most n per key, idHash order, superset stability across caps") {
    val df = (0L until 40L).map(i => (i, s"k${i % 2}")).toDF("id", "src")
    val two = Curation.capPerKey(df, "id", "src", n = 2)
      .as[(String, Long, Long)].collect()
    assert(two.length == 4 && two.groupBy(_._1).forall(_._2.length == 2))
    assert(two.forall(r => r._3 >= 1 && r._3 <= 2))
    // replicate the arithmetic hash order driver-side
    def h(id: Long): Long = (id * 2654435761L) % 4294967296L
    for ((k, rows) <- two.groupBy(_._1)) {
      val ids = (0L until 40L).filter(i => s"k${i % 2}" == k)
      val expect = ids.sortBy(i => (h(i), i)).take(2)
      assert(rows.sortBy(_._3).map(_._2).toSeq == expect,
        s"key $k: expected $expect")
    }
    val three = Curation.capPerKey(df, "id", "src", n = 3)
      .as[(String, Long, Long)].collect()
    val twoSet = two.map(r => (r._1, r._2)).toSet
    val threeSet = three.map(r => (r._1, r._2)).toSet
    assert(twoSet.subsetOf(threeSet), "raising n must re-select a superset")
  }

  test("capPerKey: keys under the cap keep everything; partial-agg plan") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val out = Curation.capPerKey(df, "id", "src", n = 5)
    assert(out.count() == 3)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected the bounded typed-aggregator two-phase plan:\n$plan")
    assert(!plan.contains("Window"),
      "capPerKey must not plan a per-key window")
  }

  test("weightedLottery: keep rate proportional to weight, deterministic, superset on raise") {
    // ids 0..999, weight = 1.0 for even ids, 3.0 for odd: odd ids must be
    // kept ~3x as often at the same target
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) 1.0 else 3.0))
      .toDF("id", "w")
    val out = Curation.weightedLottery(df, "id", "w", targetRows = 200)
      .as[(Long, Long, Long)].collect()
    // replicate driver-side: sw = 500*1e6 + 500*3e6 = 2e9
    def h(id: Long): Long = (id * 2654435761L) % 4294967296L % 1000000L
    val expect = (0L until 1000L).filter { i =>
      val w = if (i % 2 == 0) 1000000L else 3000000L
      val rate = math.min(1000000L,
        math.round(1000000.0 * (200.0 * w.toDouble / 2.0e9)))
      h(i) < rate
    }
    assert(out.map(_._1).sorted.toSeq == expect)
    val odd = out.count(_._1 % 2 == 1)
    val even = out.length - odd
    assert(odd > even, s"weight-3 rows must dominate, got odd=$odd even=$even")
    // superset stability
    val more = Curation.weightedLottery(df, "id", "w", targetRows = 400)
      .select($"id").as[Long].collect().toSet
    assert(out.map(_._1).toSet.subsetOf(more))
    // zero/negative/null/NaN/infinite weights never kept (and never throw:
    // a NaN would otherwise blow the ANSI double->long cast mid-job)
    val z = Curation.weightedLottery(
      Seq((1L, 0.0), (2L, -5.0), (3L, 1.0), (4L, Double.NaN),
        (5L, Double.PositiveInfinity)).toDF("id", "w"), "id", "w", 10)
    assert(z.select($"id").as[Long].collect().toSeq == Seq(3L))
    val n = Curation.weightedLottery(
      Seq[(Long, java.lang.Double)]((1L, null), (2L, java.lang.Double.valueOf(2.0)))
        .toDF("id", "w"), "id", "w", 10)
    assert(n.select($"id").as[Long].collect().toSeq == Seq(2L))
  }

  test("benchmarkGramsPinned survives shared-queue churn; release unpersists") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu")).toDF("doc_id", "text")
    // settle to a known baseline: no queue-managed sets cached
    Curation.releaseGramSets()
    assert(Curation.cachedGramSetCount == 0)
    val (grams, release) = Curation.benchmarkGramsPinned(bench, "text",
      ngramLen = 3)
    assert(grams.count() > 0)
    // the pin contract: a pinned set NEVER enters the bounded queue, so
    // no later call can evict it — only the caller's release() ends it
    assert(Curation.cachedGramSetCount == 0,
      "a pinned gram set must not occupy a shared-queue slot")
    // churn the queue with three queue-managed sets: it stays bounded at
    // 2 and evicts only its own members
    (0 until 3).foreach(_ =>
      Curation.benchmarkGrams(bench, "text", ngramLen = 3).count())
    assert(Curation.cachedGramSetCount == 2,
      "the shared queue must stay at its 2-slot bound")
    // the pinned frame still answers (and release is idempotent-safe to
    // call exactly once, after which the caller drops the handle)
    assert(grams.count() > 0)
    release()
    Curation.releaseGramSets()
    assert(Curation.cachedGramSetCount == 0)
  }
}

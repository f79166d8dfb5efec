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

  test("Kneser-Ney: hand-computed interpolated probabilities on a tiny corpus") {
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val m = NgramLm.trainKn(tiny, "text", minBigramCount = 2L, d = 0.75, k = 0.1)
    // pruned bigrams: only "a b"=2 survives minCount=2 -> B=1
    // hist a: ct=2, n1h=1; cont b: cc=1; V=3
    assert(m.bTypes == 1L && m.histTotals.get("a") == 2L &&
      m.histDistinct.get("a") == 1L && m.contCounts.get("b") == 1L)
    val denom = 1L + 0.1 * 3 // B + kV
    def base(cc: Long): Double = (cc + 0.1) / denom
    // "a b": P(a)=base(0) [a has no continuation count],
    //        P(b|a)=max(2-0.75,0)/2 + ((0.75*1)/2)*base(1)
    val pA = base(0L)
    val pBgA = math.max(2L - 0.75, 0.0) / 2L + ((0.75 * 1L) / 2L) * base(1L)
    val wantPpl = math.pow(2.0,
      (-(math.log(pA) / math.log(2.0)) + -(math.log(pBgA) / math.log(2.0))) / 2)
    val got = Seq((9L, "a b")).toDF("id", "text")
      .select(NgramLm.perplexityKn(col("text"), m)).head().getDouble(0)
    assert(math.abs(got - wantPpl) < 1e-12, s"got $got want $wantPpl")
    // unseen history falls back to the continuation base: "c b" scores
    // base(0) then base(1) (history c has no pruned bigrams)
    val got2 = Seq((9L, "c b")).toDF("id", "text")
      .select(NgramLm.perplexityKn(col("text"), m)).head().getDouble(0)
    val want2 = math.pow(2.0,
      (-(math.log(base(0L)) / math.log(2.0)) +
        -(math.log(base(1L)) / math.log(2.0))) / 2)
    assert(math.abs(got2 - want2) < 1e-12)
  }

  test("trigram Kneser-Ney: hand-computed three-level interpolation on a " +
      "tiny corpus") {
    // corpus: "a b c" x2, "a b d" -> trigrams "a b c"=2, "a b d"=1; prune
    // minCount=2 keeps only "a b c"
    val tiny = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("id", "text")
    val m = NgramLm.trainKn3(tiny, "text", minTrigramCount = 2L, d = 0.75, k = 0.1)
    // tri table {a b c: 2}; hist "a b": ct=2, nd=1; mid {b c: 1};
    // mh b: ct=1, nd=1; cont c: 1; M=1; V=4 (a b c d)
    assert(m.vocabSize == 4 && m.mTypes == 1L)
    assert(m.triHistTotals.get("a b") == 2L && m.triHistDistinct.get("a b") == 1L)
    assert(m.midCounts.get("b c") == 1L && m.midHistTotals.get("b") == 1L)
    assert(m.contCounts.get("c") == 1L)
    val denom = 1L + 0.1 * 4 // M + kV
    def base(cc: Long): Double = (cc + 0.1) / denom
    // score "a b c": P(a)=base(0); P(b|a)=base(0) (mid history a unseen);
    // P(c|a,b)=max(2-.75,0)/2 + ((.75*1)/2)*midLevel(c|b)
    //   midLevel(c|b)=max(1-.75,0)/1 + ((.75*1)/1)*base(1)
    val midCgB = math.max(1L - 0.75, 0.0) / 1L + ((0.75 * 1L) / 1L) * base(1L)
    val triC = math.max(2L - 0.75, 0.0) / 2L + ((0.75 * 1L) / 2L) * midCgB
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val wantPpl = math.pow(2.0,
      (-l2(base(0L)) + -l2(base(0L)) + -l2(triC)) / 3)
    val got = Seq((9L, "a b c")).toDF("id", "text")
      .select(NgramLm.perplexityKn3(col("text"), m)).head().getDouble(0)
    assert(math.abs(got - wantPpl) < 1e-12, s"got $got want $wantPpl")
    // unseen trigram history falls to the middle level, unseen middle
    // history to the base: "x b c" scores base, base, midLevel(c|b)
    val got2 = Seq((9L, "x b c")).toDF("id", "text")
      .select(NgramLm.perplexityKn3(col("text"), m)).head().getDouble(0)
    val want2 = math.pow(2.0, (-l2(base(0L)) + -l2(base(0L)) + -l2(midCgB)) / 3)
    assert(math.abs(got2 - want2) < 1e-12, s"got $got2 want $want2")
  }

  test("modified KN: Chen-Goodman discount estimates are exact arithmetic") {
    // counts [1,1,1,2,2,3,4]: n1=3 n2=2 n3=1 n4=1; Y = 3/7;
    // d1 = 1 - 2*(3/7)*(2/3) = 3/7; d2 = 2 - 3*(3/7)*(1/2) = 19/14;
    // d3 = 3 - 4*(3/7)*(1/1) = 9/7
    val counts = new java.util.ArrayList[java.lang.Long]()
    Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L).foreach(c => counts.add(c))
    val (d1, d2, d3) = NgramLm.estimateDiscounts(counts)
    val y = 3.0 / (3.0 + 2.0 * 2.0)
    assert(d1 == 1.0 - 2.0 * y * (2.0 / 3.0))
    assert(d2 == 2.0 - 3.0 * y * (1.0 / 2.0))
    assert(d3 == 3.0 - 4.0 * y * (1.0 / 1.0))
    // degenerate bucket: the level falls back to KenLM's
    // --discount_fallback defaults (deterministic, twin-replayable)
    val bad = new java.util.ArrayList[java.lang.Long]()
    Seq(1L, 2L, 3L).foreach(c => bad.add(c)) // n4 = 0
    assert(NgramLm.estimateDiscounts(bad) == ((0.5, 1.0, 1.5)))
  }

  test("modified KN: trained discounts + per-history buckets replay a " +
    "hand-scored chain; memorized < held-out < junk; no shuffle") {
    val ref = docs.filter($"doc_id" < 400)
    val m = NgramLm.trainKn3Mod(ref, "text", maxVocab = 256)
    // estimated discounts are in their legal ranges and differ per level
    assert(m.triD1 > 0 && m.triD1 < 1 && m.triD2 > 0 && m.triD2 < 2 &&
      m.triD3 > 0 && m.triD3 < 3)
    assert(m.midD1 > 0 && m.midD1 < 1)
    // hand-replay ONE scored document against the model tables: the
    // kernel's arithmetic is pinned by recomputing p(w|h) in test Scala
    // from the same maps (same op order) for the first 3 tokens
    val doc = docs.filter($"doc_id" === 400).select($"text").head.getString(0)
    val words = doc.split("\\s+").filter(_.nonEmpty).take(3)
    def disc(c: Long, d1: Double, d2: Double, d3: Double) =
      if (c <= 0) 0.0 else if (c == 1) d1 else if (c == 2) d2 else d3
    def unpack(p: Long) = {
      val msk = (1L << 21) - 1
      ((p & msk).toDouble, ((p >> 21) & msk).toDouble, ((p >> 42) & msk).toDouble)
    }
    def base(w: String) = {
      val cc = Option(m.contCounts.get(w)).map(_.longValue()).getOrElse(0L)
      (cc + m.k) / (m.mTypes + m.k * m.vocabSize)
    }
    def midLvl(v: String, w: String) = Option(m.midHistTotals.get(v)) match {
      case None => base(w)
      case Some(ct) =>
        val c = Option(m.midCounts.get(v + " " + w)).map(_.longValue()).getOrElse(0L)
        val (n1, n2, n3p) = unpack(m.midHistN.get(v).longValue())
        math.max(c - disc(c, m.midD1, m.midD2, m.midD3), 0.0) / ct.longValue() +
          ((m.midD1 * n1 + m.midD2 * n2 + m.midD3 * n3p) / ct.longValue()) * base(w)
    }
    def triLvl(u: String, v: String, w: String) =
      Option(m.triHistTotals.get(u + " " + v)) match {
        case None => midLvl(v, w)
        case Some(ct) =>
          val c = Option(m.trigrams.get(u + " " + v + " " + w))
            .map(_.longValue()).getOrElse(0L)
          val (n1, n2, n3p) = unpack(m.triHistN.get(u + " " + v).longValue())
          math.max(c - disc(c, m.triD1, m.triD2, m.triD3), 0.0) / ct.longValue() +
            ((m.triD1 * n1 + m.triD2 * n2 + m.triD3 * n3p) / ct.longValue()) *
              midLvl(v, w)
      }
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val want = math.pow(2.0, -(l2(base(words(0))) + l2(midLvl(words(0), words(1))) +
      l2(triLvl(words(0), words(1), words(2)))) / 3.0)
    val got = Seq(Tuple1(words.mkString(" "))).toDF("text")
      .select(NgramLm.perplexityKn3Mod($"text", m)).head().getDouble(0)
    assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    // ordering contract + plan shape
    val memorized = ref.limit(50)
      .agg(avg(NgramLm.perplexityKn3Mod($"text", m))).head().getDouble(0)
    val held = docs.filter($"doc_id" >= 400)
      .select(NgramLm.perplexityKn3Mod($"text", m).as("p"))
    val heldMean = held.agg(avg($"p")).head().getDouble(0)
    val junk = Seq(Tuple1("zq xv qqj wq zzk vvx jjq kqz")).toDF("text")
      .select(NgramLm.perplexityKn3Mod($"text", m)).head().getDouble(0)
    assert(memorized < heldMean && heldMean < junk,
      s"memorized=$memorized < held=$heldMean < junk=$junk must hold")
    val plan = held.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"mod-KN3 scoring must not shuffle:\n$plan")
    assert(plan.contains("lm_kn3_mod_perplexity"), "kernel must be in-plan")
  }

  test("modified KN: the estimator has no corpus ceiling — discounts are " +
    "byte-identical under a scoring-table prune the old cap would refuse") {
    val ref = docs.filter($"doc_id" < 400)
    val full = NgramLm.trainKn3Mod(ref, "text", maxVocab = 256)
    val nTypes = full.trigrams.size()
    assert(nTypes > 500, s"corpus must outgrow the small cap, got $nTypes")
    // the r15 code path REQUIRED maxTrigrams >= unpruned types and threw
    // here; now the scoring table prunes deterministically while the
    // distributed count-of-counts keeps the discounts exact
    val pruned = NgramLm.trainKn3Mod(ref, "text", maxVocab = 256,
      maxTrigrams = 500)
    assert(pruned.trigrams.size() == 500, "scoring table prunes to the cap")
    assert((pruned.triD1, pruned.triD2, pruned.triD3) ==
      ((full.triD1, full.triD2, full.triD3)) &&
      (pruned.midD1, pruned.midD2, pruned.midD3) ==
        ((full.midD1, full.midD2, full.midD3)),
      "discounts are corpus statistics — the prune must not move them")
    // the pruned model still scores (backoff covers pruned-away grams)
    val p = docs.filter($"doc_id" >= 400).limit(20)
      .agg(avg(NgramLm.perplexityKn3Mod($"text", pruned))).head().getDouble(0)
    assert(p > 1.0 && !p.isNaN)
  }

  test("trigram KN separates in-domain from junk and plans no shuffle") {
    val kn3 = NgramLm.trainKn3(docs.filter($"doc_id" < 400), "text",
      maxVocab = 256, minTrigramCount = 2)
    val held = docs.filter($"doc_id" >= 400)
      .select(NgramLm.perplexityKn3($"text", kn3).as("p"))
    val junk = Seq((1L, "zq xv qqj wq zzk vvx jjq kqz")).toDF("id", "text")
      .select(NgramLm.perplexityKn3($"text", kn3).as("p"))
    val heldMean = held.agg(avg($"p")).head().getDouble(0)
    val junkP = junk.head().getDouble(0)
    assert(junkP > heldMean * 5,
      s"junk must score far worse: junk=$junkP held-mean=$heldMean")
    val plan = held.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"KN3 scoring must not shuffle:\n$plan")
  }

  test("Kneser-Ney separates in-domain from junk and plans no shuffle") {
    val kn = NgramLm.trainKn(docs.filter($"doc_id" < 400), "text",
      maxVocab = 256, minBigramCount = 2)
    val held = docs.filter($"doc_id" >= 400)
      .select(NgramLm.perplexityKn($"text", kn).as("p"))
    val junk = Seq((1L, "zq xv qqj wq zzk vvx jjq kqz")).toDF("id", "text")
      .select(NgramLm.perplexityKn($"text", kn).as("p"))
    val heldMean = held.agg(avg($"p")).head().getDouble(0)
    val junkP = junk.head().getDouble(0)
    assert(junkP > heldMean * 5,
      s"junk must score far worse: junk=$junkP held-mean=$heldMean")
    val plan = held.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"KN scoring must not shuffle:\n$plan")
  }

  test("KN token logprobs fold back to KN perplexity; minKProbKn orders " +
      "in-train > held-out > junk") {
    val kn = NgramLm.trainKn(docs.filter($"doc_id" < 400), "text",
      maxVocab = 256, minBigramCount = 2)
    // consistency: perplexity is 2^(-mean) of the per-token array
    val row = docs.filter($"doc_id" === 7)
      .select(NgramLm.tokenLogProbsKn($"text", kn).as("lp"),
        NgramLm.perplexityKn($"text", kn).as("ppl")).head()
    val lps = row.getSeq[Double](0)
    val want = math.pow(2.0, lps.map(-_).sum / lps.length)
    assert(math.abs(row.getDouble(1) - want) < 1e-9)

    val inTrain = NgramLm.minKProbKn(docs.filter($"doc_id" < 50),
      "doc_id", "text", kn).agg(avg($"mink_avg_logprob")).head().getDouble(0)
    val heldOut = NgramLm.minKProbKn(docs.filter($"doc_id" >= 400),
      "doc_id", "text", kn).agg(avg($"mink_avg_logprob")).head().getDouble(0)
    val junk = NgramLm.minKProbKn(
      Seq((1L, "zq xv qqj wq zzk vvx jjq kqz")).toDF("doc_id", "text"),
      "doc_id", "text", kn).head().getDouble(2)
    assert(inTrain >= heldOut,
      s"in-train must not score below held-out: $inTrain vs $heldOut")
    assert(heldOut > junk + 1.0,
      s"held-out must clearly beat junk: $heldOut vs $junk")
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

  test("tokenLogProbs: perplexity is 2^(-mean) of the per-token array, " +
    "hand-checked on the tiny corpus") {
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val m = NgramLm.train(tiny, "text", k = 1.0, minBigramCount = 1L)
    val lp = tiny.filter($"id" === 1)
      .select(NgramLm.tokenLogProbs($"text", m)).head().getSeq[Double](0)
    // P(a) = 4/9, P(b|a) = 1/2 (the hand computation above)
    assert(lp.length == 2)
    assert(math.abs(lp(0) - math.log(4.0 / 9.0) / math.log(2.0)) < 1e-12)
    assert(math.abs(lp(1) - math.log(0.5) / math.log(2.0)) < 1e-12)
    val ppl = tiny.filter($"id" === 1)
      .select(NgramLm.perplexity($"text", m)).head().getDouble(0)
    assert(math.abs(ppl - math.pow(2.0, -lp.sum / lp.length)) < 1e-12)
  }

  test("minKProb: memorized (in-train) docs score higher than held-out, " +
    "held-out higher than junk; empty text is NULL; no shuffle") {
    val train = docs.filter($"doc_id" < 400)
    def avgScore(df: org.apache.spark.sql.DataFrame): Double =
      NgramLm.minKProb(df, "doc_id", "text", model, frac = 0.2)
        .agg(avg($"mink_avg_logprob")).head().getDouble(0)
    val inTrain = avgScore(train)
    val heldOut = avgScore(docs.filter($"doc_id" >= 400))
    val junk = avgScore((0 until 50)
      .map(i => (i.toLong, s"zzq$i xkv$i qqj$i wvx$i zzq$i mmk$i"))
      .toDF("doc_id", "text"))
    info(f"min-20%% avg logprob: in-train=$inTrain%.2f held-out=$heldOut%.2f " +
      f"junk=$junk%.2f")
    assert(inTrain > heldOut && heldOut > junk,
      s"expected in-train > held-out > junk, got $inTrain / $heldOut / $junk")

    val out = NgramLm.minKProb(
      Seq((1L, ""), (2L, "a b c d e f g h i j")).toDF("doc_id", "text"),
      "doc_id", "text", model, frac = 0.25)
    val rows = out.orderBy($"id").collect()
    assert(rows(0).isNullAt(2) && rows(0).getLong(1) == 0L)
    // 10 tokens at frac 0.25 -> kk = 3: mean of the 3 lowest logprobs
    val lp = Seq((2L, "a b c d e f g h i j")).toDF("doc_id", "text")
      .select(NgramLm.tokenLogProbs($"text", model)).head().getSeq[Double](0)
    val expect = lp.sorted.take(3).sum / 3
    assert(math.abs(rows(1).getDouble(2) - expect) < 1e-12)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"min-k scoring must not shuffle:\n$plan")
  }

  test("distributed KN3 frames: identical model and perplexities to the " +
      "broadcast route, no cartesian term, no ceiling, empty docs score 0") {
    val train = docs.filter($"doc_id" % 4 =!= 0)
    val target = docs.filter($"doc_id" % 4 === 0)
    val bm = NgramLm.trainKn3(train, "text", maxVocab = 256,
      minTrigramCount = 2)
    val fm = NgramLm.trainKn3Distributed(train, "text", maxVocab = 256,
      minTrigramCount = 2)
    // model identity: the distributed frames ARE the collected tables
    assert(fm.vocabSize == bm.vocabSize && fm.mTypes == bm.mTypes)
    val triMap = fm.trigrams.collect().map(r =>
      (r.getString(0) + " " + r.getString(1) + " " + r.getString(2)) ->
        r.getLong(3)).toMap
    assert(triMap.size == bm.trigrams.size())
    triMap.foreach { case (g, c) =>
      assert(bm.trigrams.get(g) != null && bm.trigrams.get(g).longValue() == c,
        s"trigram $g: frames=$c collected=${bm.trigrams.get(g)}")
    }
    val contMap = fm.contCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(contMap.size == bm.contCounts.size())
    contMap.foreach { case (w, c) =>
      assert(bm.contCounts.get(w).longValue() == c)
    }
    // scoring: five joins vs one broadcast probe — same IEEE arithmetic,
    // agreement to ulps (log2/pow libm paths differ); x1e4-rounded exact
    val dist = NgramLm.scoreKn3Distributed(target, "doc_id", "text", fm)
    val bc = target.select($"doc_id",
      NgramLm.perplexityKn3($"text", bm).as("bppl"))
    val j = dist.join(bc, "doc_id").select($"doc_id", $"ppl", $"bppl")
      .collect()
    assert(j.length == target.count())
    j.foreach { r =>
      val a = r.getDouble(1); val b = r.getDouble(2)
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"doc ${r.get(0)}: frames=$a broadcast=$b")
      assert(math.round(a * 10000) == math.round(b * 10000))
    }
    val plan = dist.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"distributed scoring must stay equi-joined:\n$plan")
    // empty/whitespace docs score 0.0 exactly like the kernel
    val e = NgramLm.scoreKn3Distributed(
      Seq((7L, "   ")).toDF("doc_id", "text"), "doc_id", "text", fm)
      .head()
    assert(e.getDouble(1) == 0.0)
    fm.unpersist()
    // the route has no cap: the same corpus that trips trainKn3's
    // fail-fast maxTrigrams trains fine through the frames path
    intercept[IllegalArgumentException] {
      NgramLm.trainKn3(train, "text", maxVocab = 256, minTrigramCount = 1,
        maxTrigrams = 10)
    }
    val fm2 = NgramLm.trainKn3Distributed(train, "text", maxVocab = 256,
      minTrigramCount = 1)
    assert(fm2.trigrams.count() > 10)
    fm2.unpersist()
  }

  test("distributed KN bigram frames: identical model and perplexities to " +
      "the broadcast route, vocab prune honored, no cartesian term, no cap") {
    val train = docs.filter($"doc_id" % 4 =!= 0)
    val target = docs.filter($"doc_id" % 4 === 0)
    val bm = NgramLm.trainKn(train, "text", maxVocab = 256,
      minBigramCount = 2)
    val fm = NgramLm.trainKnDistributed(train, "text", maxVocab = 256,
      minBigramCount = 2)
    // model identity: the frames ARE the collected tables, including the
    // vocab-membership filter on bigram histories
    assert(fm.vocabSize == bm.vocabSize && fm.bTypes == bm.bTypes)
    val biMap = fm.bigrams.collect().map(r =>
      (r.getString(0) + " " + r.getString(1)) -> r.getLong(2)).toMap
    assert(biMap.size == bm.bigrams.size())
    biMap.foreach { case (g, c) =>
      assert(bm.bigrams.get(g) != null && bm.bigrams.get(g).longValue() == c,
        s"bigram $g: frames=$c collected=${bm.bigrams.get(g)}")
    }
    val contMap = fm.contCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(contMap.size == bm.contCounts.size())
    contMap.foreach { case (w, c) =>
      assert(bm.contCounts.get(w).longValue() == c)
    }
    fm.hist.collect().foreach { r =>
      val h = r.getString(0)
      assert(bm.histTotals.get(h).longValue() == r.getLong(1) &&
        bm.histDistinct.get(h).longValue() == r.getLong(2),
        s"history $h totals/distinct mismatch")
    }
    // scoring: three joins vs the broadcast probe — same IEEE association
    val dist = NgramLm.scoreKnDistributed(target, "doc_id", "text", fm)
    val bc = target.select($"doc_id",
      NgramLm.perplexityKn($"text", bm).as("bppl"))
    val j = dist.join(bc, "doc_id").select($"doc_id", $"ppl", $"bppl")
      .collect()
    assert(j.length == target.count())
    j.foreach { r =>
      val a = r.getDouble(1); val b = r.getDouble(2)
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"doc ${r.get(0)}: frames=$a broadcast=$b")
      assert(math.round(a * 10000) == math.round(b * 10000))
    }
    val plan = dist.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"distributed scoring must stay equi-joined:\n$plan")
    val e = NgramLm.scoreKnDistributed(
      Seq((7L, "   ")).toDF("doc_id", "text"), "doc_id", "text", fm)
      .head()
    assert(e.getDouble(1) == 0.0)
    fm.unpersist()
    // no cap: the same corpus that trips train()'s fail-fast maxBigrams
    // trains fine through the frames path
    intercept[IllegalArgumentException] {
      NgramLm.trainKn(train, "text", maxVocab = 256, minBigramCount = 1,
        maxBigrams = 10)
    }
    val fm2 = NgramLm.trainKnDistributed(train, "text", maxVocab = 256,
      minBigramCount = 1)
    assert(fm2.bigrams.count() > 10)
    fm2.unpersist()
  }

  test("distributed trainers never leak cached frames on their error " +
      "paths: a require firing after a persist unpersists first") {
    def cachedRdds(): Int = spark.sparkContext.getPersistentRDDs.size
    val junk = Seq((1L, "x y z")).toDF("doc_id", "text")
    val before = cachedRdds()
    // every pruned table is empty at this minimum count -> the nonempty
    // require fires AFTER the frame was persisted
    intercept[IllegalArgumentException] {
      NgramLm.trainKnDistributed(junk, "text", minBigramCount = 99L)
    }
    intercept[IllegalArgumentException] {
      NgramLm.trainKn3Distributed(junk, "text", minTrigramCount = 99L)
    }
    // empty corpus: add-k's total-tokens require fires after vocab persist
    intercept[IllegalArgumentException] {
      NgramLm.trainDistributed(
        Seq((1L, "")).toDF("doc_id", "text"), "text")
    }
    assert(cachedRdds() == before,
      s"failed trainings must not leave cached frames behind " +
        s"(before=$before after=${cachedRdds()})")
    // the success path of trainKnDistributed also releases its
    // training-only vocab cache (only the bigram frame survives, and
    // KnFrames.unpersist releases that)
    val fm = NgramLm.trainKnDistributed(docs.limit(50), "text",
      maxVocab = 64, minBigramCount = 1)
    assert(cachedRdds() == before + 1,
      "only the bigram frame may stay cached after training")
    fm.unpersist()
    assert(cachedRdds() == before)
  }

  test("distributed add-k frames: identical model and perplexities to the " +
      "broadcast route, pruned-history backoff honored, empty docs 0") {
    val train = docs.filter($"doc_id" % 4 =!= 0)
    val target = docs.filter($"doc_id" % 4 === 0)
    val bm = NgramLm.train(train, "text", maxVocab = 256, minBigramCount = 2)
    val fm = NgramLm.trainDistributed(train, "text", maxVocab = 256,
      minBigramCount = 2)
    assert(fm.vocabSize == bm.vocabSize && fm.totalTokens == bm.totalTokens)
    val uniMap = fm.unigrams.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uniMap.size == bm.unigrams.size())
    uniMap.foreach { case (w, c) =>
      assert(bm.unigrams.get(w).longValue() == c)
    }
    val biMap = fm.bigrams.collect().map(r =>
      (r.getString(0) + " " + r.getString(1)) -> r.getLong(2)).toMap
    assert(biMap.size == bm.bigrams.size())
    biMap.foreach { case (g, c) =>
      assert(bm.bigrams.get(g).longValue() == c)
    }
    val dist = NgramLm.scoreDistributed(target, "doc_id", "text", fm)
    val bc = target.select($"doc_id",
      NgramLm.perplexity($"text", bm).as("bppl"))
    val j = dist.join(bc, "doc_id").select($"doc_id", $"ppl", $"bppl")
      .collect()
    assert(j.length == target.count())
    j.foreach { r =>
      val a = r.getDouble(1); val b = r.getDouble(2)
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"doc ${r.get(0)}: frames=$a broadcast=$b")
      assert(math.round(a * 10000) == math.round(b * 10000))
    }
    val e = NgramLm.scoreDistributed(
      Seq((7L, "")).toDF("doc_id", "text"), "doc_id", "text", fm)
      .head()
    assert(e.getDouble(1) == 0.0)
    fm.unpersist()
  }

  test("distributed modified-KN frames: same discounts, same perplexities " +
      "as the broadcast route while the corpus sits under its cap") {
    val train = docs.filter($"doc_id" % 4 =!= 0)
    val target = docs.filter($"doc_id" % 4 === 0)
    val bm = NgramLm.trainKn3Mod(train, "text", maxVocab = 256)
    val fm = NgramLm.trainKn3ModDistributed(train, "text", maxVocab = 256)
    // discounts are corpus statistics from the SAME distributed
    // count-of-counts — byte-identical between the routes
    assert(fm.triD1 == bm.triD1 && fm.triD2 == bm.triD2 &&
      fm.triD3 == bm.triD3)
    assert(fm.midD1 == bm.midD1 && fm.midD2 == bm.midD2 &&
      fm.midD3 == bm.midD3)
    assert(fm.mTypes == bm.mTypes && fm.vocabSize == bm.vocabSize)
    // per-history buckets: frame columns equal the packed-long tallies
    val mask = (1L << 21) - 1
    fm.triHist.collect().foreach { r =>
      val h = r.getString(0) + " " + r.getString(1)
      val packed = bm.triHistN.get(h)
      assert(packed != null, s"history $h missing from broadcast model")
      assert((packed.longValue() & mask) == r.getLong(3) &&
        ((packed.longValue() >> 21) & mask) == r.getLong(4) &&
        ((packed.longValue() >> 42) & mask) == r.getLong(5),
        s"history $h bucket mismatch")
    }
    val dist = NgramLm.scoreKn3ModDistributed(target, "doc_id", "text", fm)
    val bc = target.select($"doc_id",
      NgramLm.perplexityKn3Mod($"text", bm).as("bppl"))
    val j = dist.join(bc, "doc_id").select($"ppl", $"bppl").collect()
    assert(j.length == target.count())
    j.foreach { r =>
      val a = r.getDouble(0); val b = r.getDouble(1)
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"frames=$a broadcast=$b")
      assert(math.round(a * 10000) == math.round(b * 10000))
    }
    fm.unpersist()
  }
}

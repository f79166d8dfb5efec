package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("jaccard: identical shingle sets give 1.0, disjoint give 0.0") {
    val df = Seq(
      (Seq("a b c", "b c d"), Seq("a b c", "b c d")),
      (Seq("a b c"), Seq("x y z"))).toDF("a", "b")
    val r = df.select(Dedup.jaccard($"a", $"b").as("j")).collect().map(_.getDouble(0))
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("tokenShingles: 5 tokens -> 3 distinct 3-gram shingles") {
    val r = Seq("a b c d e").toDF("t")
      .select(Dedup.tokenShingles($"t", 3).as("sh")).head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d e"))
    // short text: falls back to the whole text as a single shingle
    val short = Seq("a b").toDF("t")
      .select(Dedup.tokenShingles($"t", 3).as("sh")).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("tokenShingles kernel is byte-equivalent to the declarative formula") {
    // the codegen'd kernel must reproduce split/slice/join/distinct exactly,
    // including empty tokens from leading/trailing/double spaces, unicode,
    // repeated shingles (first-occurrence order) and sub-n-token docs
    def declarative(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ")
      val count = size(toks) - (n - 1)
      when(count >= 1,
        array_distinct(transform(sequence(lit(1), count),
          i => array_join(slice(toks, i, lit(n)), " "))))
        .otherwise(array_distinct(array(array_join(toks, " "))))
    }
    val edge = Seq(
      "", " ", "  ", "a", "a ", " a", "a  b", "a b a b a b",
      "über ötzi 東京 日本 東京 日本", "x", "tab\tand spaces", "a b c d e f g")
    val corpus = edge.toDF("t") // plus real docs below
      .unionAll(docs.select($"text".as("t")))
    for (n <- Seq(1, 2, 3, 5)) {
      val mismatches = corpus
        .select(Dedup.tokenShingles($"t", n).as("fast"), declarative($"t", n).as("slow"))
        .filter(not($"fast" <=> $"slow"))
        .count()
      assert(mismatches == 0L, s"kernel diverges from declarative formula at n=$n")
    }
  }

  test("minhash signature is deterministic and length-k") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .select(Dedup.minhashSignature(Dedup.tokenShingles($"t", 3), 64).as("sig"))
    val a = df.head().getSeq[Long](0)
    val b = df.head().getSeq[Long](0)
    assert(a.length == 64 && a == b)
  }

  test("minhash LSH finds exactly the planted near-dup pairs (vs exact)") {
    val exact = Dedup.nearDupPairsExact(docs, "doc_id", "text", 3, threshold = 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearDupPairsMinHash(docs, "doc_id", "text", 3, 128, 32, threshold = 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == exact, s"LSH recall/precision mismatch: missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("size-ratio prefilter preserves the exact Jaccard result") {
    // the prefilter is a necessary condition for jaccard >= t, so the exact
    // path must return the same pairs as a plain all-pairs scan
    val pre = Dedup.nearDupPairsExact(docs, "doc_id", "text", 2, threshold = 0.7)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s = docs.select($"doc_id".cast("long").as("id"),
      Dedup.tokenShingles($"text", 2).as("sh"))
    val all = s.as("a").join(s.as("b"), $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        Dedup.jaccard($"a.sh", $"b.sh").as("j"))
      .filter($"j" >= 0.7)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pre.nonEmpty, "testdata should contain planted bigram near-dups")
    assert(pre == all, s"prefilter changed the result: missed=${all -- pre} extra=${pre -- all}")
  }

  test("prefix-filter and inverted-count Jaccard joins equal the exact all-pairs result") {
    // prefix filtering is lossless for a Jaccard threshold: every pair with
    // jaccard >= t must share a rare-first prefix shingle, so the equi-join
    // candidate stage cannot drop a qualifying pair. The inverted-count path
    // counts every shared shingle outright. Both must match all-pairs
    // bit-exactly, jaccard value included.
    for (t <- Seq(0.5, 0.7)) {
      val exact = Dedup.nearDupPairsExact(docs, "doc_id", "text", 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefix = Dedup.nearDupPairsPrefix(docs, "doc_id", "text", 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inverted = Dedup.nearDupPairsInverted(docs, "doc_id", "text", 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact.nonEmpty, "testdata should contain planted bigram near-dups")
      assert(prefix == exact,
        s"prefix t=$t: missed=${exact -- prefix} extra=${prefix -- exact}")
      assert(inverted == exact,
        s"inverted t=$t: missed=${exact -- inverted} extra=${inverted -- exact}")
    }
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    // signature agreement rate approximates jaccard
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i x")).toDF("t1", "t2")
      .select(
        Dedup.minhashSignature(Dedup.tokenShingles($"t1", 2), 256).as("s1"),
        Dedup.minhashSignature(Dedup.tokenShingles($"t2", 2), 256).as("s2"),
        Dedup.jaccard(Dedup.tokenShingles($"t1", 2), Dedup.tokenShingles($"t2", 2)).as("j"))
    val row = df.head()
    val s1 = row.getSeq[Long](0); val s2 = row.getSeq[Long](1); val j = row.getDouble(2)
    val est = s1.zip(s2).count(p => p._1 == p._2).toDouble / s1.length
    assert(math.abs(est - j) < 0.15, s"estimate $est vs exact $j")
  }

  test("simhash: identical texts collide, near-dup texts are close in hamming") {
    val df = Seq(
      ("x", "the quick brown fox jumps over the lazy dog today"),
      ("y", "the quick brown fox jumps over the lazy dog today"),
      ("z", "the quick brown fox jumps over the lazy cat today"),
      ("w", "completely different words entirely unrelated content here now")).toDF("id", "t")
      .select($"id", Dedup.simhash(split($"t", " ")).as("fp"))
    val fp = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("x") == fp("y"))
    assert(java.lang.Long.bitCount(fp("x") ^ fp("z")) < 16)
    assert(java.lang.Long.bitCount(fp("x") ^ fp("w")) >
      java.lang.Long.bitCount(fp("x") ^ fp("z")))
  }

  test("simhash banding: recall guaranteed for hamming < nBands, precision exact") {
    val maxH = 6
    // ground truth: brute-force hamming over all pairs
    val fp = docs.select($"doc_id".cast("long").as("id"),
      Dedup.simhash(split($"text", " ")).as("fp"))
    val truth = fp.as("a").join(fp.as("b"), $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        Dedup.hamming64($"a.fp", $"b.fp").as("h"))
      .filter($"h" <= maxH).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap

    // nBands=8 -> pigeonhole guarantees every pair with hamming < 8 is found
    val found = Dedup.nearDupPairsSimHash(docs, "doc_id", "text",
        maxHamming = maxH, nBands = 8)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "expected some low-hamming pairs in testdata")
    assert(found == truth.keySet,
      s"missed=${truth.keySet -- found} extra=${found -- truth.keySet}")

    // default nBands=4 only guarantees hamming <= 3
    val found4 = Dedup.nearDupPairsSimHash(docs, "doc_id", "text",
        maxHamming = 3, nBands = 4)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth3 = truth.filter(_._2 <= 3).keySet
    assert(truth3.subsetOf(found4), s"missed guaranteed pairs: ${truth3 -- found4}")
  }

  test("bucket cap bounds candidate pairs on a boilerplate-skewed corpus") {
    // 200 identical docs: every (band, bucket) holds the whole corpus, so an
    // uncapped banding self-join emits C(200,2)=19900 pairs; the cap keeps
    // the first `m` ids per bucket => exactly C(m,2) pairs survive.
    val boiler = (0 until 200)
      .map(i => (i.toLong, "the same boilerplate footer text repeated verbatim"))
      .toDF("doc_id", "text")
    val m = 20
    val simPairs = Dedup.nearDupPairsSimHash(boiler, "doc_id", "text",
      maxHamming = 3, nBands = 4, maxBucketSize = m).count()
    assert(simPairs == m * (m - 1) / 2,
      s"expected ${m * (m - 1) / 2} capped pairs, got $simPairs")
    val mhPairs = Dedup.nearDupPairsMinHash(boiler, "doc_id", "text",
      threshold = 0.5, maxBucketSize = m).count()
    assert(mhPairs == m * (m - 1) / 2,
      s"expected ${m * (m - 1) / 2} capped pairs, got $mhPairs")
  }

  test("exactGroups keeps min id per key") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "k")
    val g = Dedup.exactGroups(df, "k", "id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g("x") == (1L, 2L) && g("y") == (3L, 1L))
  }

  test("connectedComponents: chains collapse, singletons excluded from labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L)
    // both execution paths must produce identical labels: the driver-side
    // union-find (small graphs) and the distributed label-propagation rounds
    val local = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Dedup.connectedComponents(pairs, smallGraphThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == expected)
    assert(distributed == expected)
  }

  test("connectedComponents: both paths agree on a 60-node chain (O(log d) rounds)") {
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Dedup.connectedComponents(chain, smallGraphThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local.size == 61 && local.values.forall(_ == 0L))
    assert(distributed == local)
  }

  test("dedupGroups: corpus-wide grouping with representatives") {
    val pairs = Dedup.nearDupPairsMinHash(docs, "doc_id", "text", 3, 128, 32, 0.5)
    val groups = Dedup.dedupGroups(docs, pairs, "doc_id")
    assert(groups.count() == docs.count(), "every doc gets a group")
    val reps = groups.filter($"is_representative").count()
    // representatives = singletons + one per connected component
    val comps = Dedup.connectedComponents(pairs)
    val nodesInGraph = comps.count()
    val nComponents = comps.select($"component").distinct().count()
    assert(reps == docs.count() - nodesInGraph + nComponents,
      s"expected ${docs.count() - nodesInGraph + nComponents} representatives, got $reps")
    assert(groups.filter(!$"is_representative").count() == nodesInGraph - nComponents)
    // group ids are always the min member
    val bad = groups.filter($"group_id" > $"id").count()
    assert(bad == 0)
  }

  test("bestPerGroup: highest score represents, ties break to the lowest id") {
    val rows = Seq((1L, 10.0), (2L, 50.0), (3L, 20.0), // cluster {1,2,3}: 2 wins
      (5L, 7.0), (6L, 7.0),                            // cluster {5,6}: tie -> 5
      (4L, 1.0)).toDF("doc_id", "q")                   // singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.bestPerGroup(rows, pairs, "doc_id", "q")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._4)).toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)),
      s"got ${out.toSeq}")
    assert(out.count(_._4) == 3, "one representative per cluster")
    // NULL scores: never beat a scored member; an all-NULL cluster still
    // gets exactly one representative (lowest id)
    val nulls = Seq((1L, Some(2.0)), (2L, None), (7L, None), (8L, None))
      .toDF("doc_id", "q")
    val nOut = Dedup.bestPerGroup(nulls,
        Seq((1L, 2L), (7L, 8L)).toDF("id_a", "id_b"), "doc_id", "q")
      .as[(Long, Long, Option[Double], Boolean)].collect().sortBy(_._1)
    assert(nOut.map(r => (r._1, r._4)).toSeq ==
      Seq((1L, true), (2L, false), (7L, true), (8L, false)), s"got ${nOut.toSeq}")
  }

  test("duplicationWeights: soft dedup sums to the deduplicated size") {
    val ids = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val w = Dedup.duplicationWeights(ids, pairs, "doc_id")
      .select($"id", $"group_id", $"cluster_size", $"weight")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(w.map(_._1).toSeq == (1L to 7L), "every row survives")
    assert(w.filter(r => Set(1L, 2L, 3L)(r._1)).forall(r =>
      r._2 == 1L && r._3 == 3L && r._4 == 1.0 / 3), s"got ${w.toSeq}")
    assert(w.filter(r => Set(5L, 6L)(r._1)).forall(r =>
      r._2 == 5L && r._3 == 2L && r._4 == 0.5))
    assert(w.filter(r => Set(4L, 7L)(r._1)).forall(r =>
      r._2 == r._1 && r._3 == 1L && r._4 == 1.0))
    // the defining invariant: weighted mass = number of distinct clusters
    val mass = w.map(_._4).sum
    assert(math.abs(mass - 4.0) < 1e-12, s"weighted corpus mass = $mass, want 4")
  }

  test("nearDupAgainstMinHash: batch-vs-corpus only, planted copies recovered") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different corpus content about spark query planning"),
      // corpus-internal near-dups must NOT appear in the output
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "totally novel text sharing nothing with anything else at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupAgainstMinHash(corpus, batch, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.exists(r => r._1 == 10L && r._2 == 1L && r._3 == 1.0),
      "exact planted copy must match its corpus source")
    assert(out.forall(_._1 >= 10L), "left side is always a batch id")
    assert(!out.exists(_._1 == 11L), "novel batch doc matches nothing")
    assert(!out.exists(r => r._1 == 1L || r._1 == 3L),
      "corpus-internal near-dup pairs (1,3) must not be emitted")
  }

  test("nearDupAgainstMinHash agrees with the exact cross-pairs twin on testdata") {
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val got = Dedup.nearDupAgainstMinHash(corpus, batch, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // exact twin: every (batch, corpus) pair with shingle jaccard >= 0.5
    val sh = docs.select($"doc_id",
      Dedup.tokenShingles($"text", 3).as("sh"))
    val exact = sh.as("b").filter($"b.doc_id" >= 400)
      .crossJoin(sh.as("c").filter($"doc_id" < 400))
      .select($"b.doc_id".as("bid"), $"c.doc_id".as("cid"),
        Dedup.jaccard($"b.sh", $"c.sh").as("j"))
      .filter($"j" >= 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(got == exact, s"banding recall must be total here: ${exact.diff(got)}")
  }

  test("dedupParagraphs: keep-first across docs and within a doc; blank lines exempt") {
    val corpus = Seq(
      (1L, "alpha one\n\nshared para\nbeta"),
      (2L, "shared para\ngamma\n\nshared para"),
      (3L, "delta\nalpha one")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // doc 1 holds every first occurrence — untouched (blank line included)
    assert(out(0) == ((1L, "alpha one\n\nshared para\nbeta", 0L)))
    // doc 2: leading "shared para" lost to doc 1, in-doc repeat lost too;
    // the blank segment is exempt structure and survives
    assert(out(1) == ((2L, "gamma\n", 2L)))
    // doc 3: "alpha one" lost to doc 1 even though it sits mid-doc there
    assert(out(2) == ((3L, "delta", 1L)))
  }

  test("dedupParagraphs: minSegmentLen exempts short segments from dedup") {
    val corpus = Seq((1L, "ab\nxyz"), (2L, "ab\nxyz")).toDF("doc_id", "text")
    val loose = Dedup.dedupParagraphs(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(loose(1) == ((2L, "", 2L)), "default floor dedups both segments")
    val floored = Dedup.dedupParagraphs(corpus, "doc_id", "text",
        minSegmentLen = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(floored(1) == ((2L, "ab", 1L)),
      "'ab' under the floor is exempt; 'xyz' meets it and dedups")
  }

  test("sourceOverlap: exact pairwise Jaccard of per-source shingle sets") {
    // srcA: {a b c, b c d, c d e}; srcB: {a b c, b c d, x y z};
    // srcC: {p q r} (disjoint — absent from the matrix)
    val df = Seq(
      ("A", "a b c d e"), ("B", "a b c d"), ("B", "x y z"), ("C", "p q r")
    ).toDF("source", "text")
    val out = Dedup.sourceOverlap(df, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("A", "B", 2L, 3L, 3L, 2.0 / 4.0)))
  }

  test("sourceOverlap: duplicate shingles within a source count once") {
    val df = Seq(
      ("A", "a b c"), ("A", "a b c"), ("B", "a b c")).toDF("source", "text")
    val out = Dedup.sourceOverlap(df, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("A", "B", 1L, 1L, 1L, 1.0)))
  }

  test("sourceOverlap: maxSourcesPerShingle drops ubiquitous shingles from both sides") {
    // "u u u" is in all three sources (ubiquitous at cap 2); each pair also
    // shares one discriminating shingle
    val df = Seq(
      ("A", "u u u"), ("A", "a b c"), ("A", "x y z"),
      ("B", "u u u"), ("B", "a b c"),
      ("C", "u u u"), ("C", "x y z")).toDF("source", "text")
    val capped = Dedup.sourceOverlap(df, "source", "text",
        maxSourcesPerShingle = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    // denominators exclude the ubiquitous shingle too: A has 2 kept, B/C 1
    assert(capped.toSeq == Seq(
      ("A", "B", 1L, 2L, 1L, 0.5), ("A", "C", 1L, 2L, 1L, 0.5)))
    intercept[IllegalArgumentException] {
      Dedup.sourceOverlap(df, "source", "text", maxSourcesPerShingle = 1)
    }
  }

  test("sourceOverlap: shingle strings reduce to hashes before any exchange") {
    val df = docs.select($"source", $"text")
    val p = Dedup.sourceOverlap(df, "source", "text")
      .queryExecution.executedPlan.toString()
    val leak = p.linesIterator.exists(l => l.contains("Exchange") && l.contains("sh#"))
    assert(!leak, s"raw shingles must never shuffle — only (source, hash):\n$p")
  }

  test("noveltyScores: df-1 shingles count as novel, shared ones do not") {
    // doc 1 {a b c, b c d}: both unique -> 1.0
    // docs 2/3 share {x y z}; doc 2 also has unique {y z w} -> 0.5; doc 3 -> 0.0
    val df = Seq(
      (1L, "a b c d"), (2L, "x y z w"), (3L, "x y z")).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("noveltyScores: repeated shingles inside one doc stay novel (per-doc distinct df)") {
    val df = Seq((1L, "a b c a b c"), (2L, "q r s")).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 1's shingles each appear in only ONE document (itself), so all novel
    assert(out.head._1 == 1L && out.head._4 == 1.0)
  }

  test("widen: under-partitioned narrow input is widened to default parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val one = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
    assert(Dedup.widen(one).rdd.getNumPartitions == p)
  }

  test("widen: already-wide narrow input passes through, never narrowed") {
    val p = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, numPartitions = 2 * p).toDF("id")
    assert(Dedup.widen(wide).rdd.getNumPartitions == 2 * p,
      "widen must not collapse an input wider than defaultParallelism")
  }

  test("widen: shuffled lineage is returned untouched (no extra exchange)") {
    val agg = spark.range(0, 100, 1, numPartitions = 4).toDF("id")
      .groupBy($"id" % 7).count()
    assert(Dedup.widen(agg) eq agg,
      "a lineage that already shuffles is shuffle.partitions wide by " +
        "construction and must not be re-examined or repartitioned")
  }

  test("widen: an exchange-free aggregate over one partition IS widened") {
    // a 1-partition child satisfies any clustered distribution, so the
    // aggregate plans with NO exchange — the logical has-an-Aggregate test
    // used to wave this 1-partition plan through untouched
    val p = spark.sparkContext.defaultParallelism
    val agg = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .groupBy($"id" % 7).count()
    assert(Dedup.widen(agg).rdd.getNumPartitions == p)
  }

  test("widen: a single-partition global-limit lineage IS widened") {
    // a global limit plans Exchange SinglePartition — exactly 1 partition,
    // the opposite of wide; counting ANY 'Exchange ' as already-wide used
    // to wave this frame through and run the downstream kernel on one core
    val p = spark.sparkContext.defaultParallelism
    val limited = spark.range(0, 1000, 1, numPartitions = 8).toDF("id")
      .limit(100).filter($"id" >= 0) // post-limit op: GlobalLimit, not CollectLimit
    assert(limited.queryExecution.executedPlan.toString
        .contains("Exchange SinglePartition"),
      "precondition: a non-terminal global limit plans Exchange " +
        "SinglePartition")
    val widened = Dedup.widen(limited)
    assert(widened.rdd.getNumPartitions == p,
      "an Exchange SinglePartition lineage is 1 partition and must widen")
  }

  test("widen: a broadcast-join lineage over a 1-partition scan is still widened") {
    // a broadcast hash join adds NO exchange on its streamed side, so the
    // logical has-a-Join test used to wave this plan through 1-partition —
    // the physical shuffle-exchange test must catch it
    val p = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
    val dim = spark.range(0, 10, 1, numPartitions = 1).toDF("id")
    val joined = narrow.join(broadcast(dim), Seq("id"))
    assert(joined.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "precondition: the join must plan as broadcast")
    assert(Dedup.widen(joined).rdd.getNumPartitions == p,
      "broadcast joins leave the streamed side's width untouched — a " +
        "1-partition scan behind one must still widen")
  }

  test("containmentPairs: directed — the quoted doc scores 1.0, the quoting doc does not") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f x y z w"),
      (3L, "p q r s t u")
    ).toDF("doc_id", "text")
    val all = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.4)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // d1 has 4 shingles, all inside d2 (8 shingles); d3 shares nothing
    assert(all.toSeq == Seq((1L, 2L, 4L, 4L, 1.0), (2L, 1L, 4L, 8L, 0.5)))
    val strict = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.75)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(strict.toSeq == Seq((1L, 2L)))
  }

  test("containmentPairs: maxDocsPerShingle drops ubiquitous shingles from both sides") {
    // boilerplate shingle "x y z" in ALL docs; unique content elsewhere
    val df = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b c"),
      (3L, "x y z p q r")
    ).toDF("doc_id", "text")
    // uncapped: every doc shares the boilerplate shingles
    val un = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.1)
      .count()
    assert(un == 6L, s"all 6 directed pairs share boilerplate, got $un")
    // capped at 2: "x y z"/"y z a" (df=3) excluded; d1/d2 still fully dup
    val capped = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.9,
        maxDocsPerShingle = 2)
      .select($"id_a", $"id_b", $"containment").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(capped.toSeq == Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.0)
    }
  }

  test("winnowingFingerprints: window minima, short-doc fallback, empty-doc nothing") {
    val df = Seq(
      (1L, "a b c d e f g h"), // 6 shingles -> 3 windows of 4
      (2L, "a b c d"),         // 2 shingles < window -> single overall min
      (3L, "a b"),             // 0 shingles -> no fingerprints
      (4L, "")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(df, "doc_id", "text",
        shingleLen = 3, window = 4)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(!fps.contains(3L) && !fps.contains(4L))
    // replicate driver-side: md5 of positional 3-gram strings
    def m(t: String): Seq[String] = {
      val toks = t.split(" ", -1)
      (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" "))
        .map { g =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
    }
    val h1 = m("a b c d e f g h")
    val expect1 = (0 to h1.length - 4).map(i => h1.slice(i, i + 4).min).toSet
    assert(fps(1L) == expect1)
    assert(fps(2L) == Set(m("a b c d").min))
    // selection is at most ceil(2/(w+1)) dense: 3 windows can pick <= 3 of 6
    assert(fps(1L).size <= 3)
  }

  test("winnowFps kernel equals the declarative MOSS formula on varied docs") {
    // independent twin (the TokenNgrams kernel-vs-declarative discipline):
    // the selection re-expressed as the md5/window-min/distinct column
    // formula the kernel replaced — bound via a single-element transform
    // so the lambda references a variable, not a recomputed expression
    import org.apache.spark.sql.Column
    def declarative(text: Column, shingleLen: Int, window: Int): Column = {
      val hashes =
        transform(Curation.tokenNgrams(text, shingleLen), g => md5(g.cast("binary")))
      array_distinct(flatten(transform(array(hashes), hs => {
        val n = size(hs)
        when(hs.isNull || n <= 0, array().cast("array<string>"))
          .when(n < window, array(array_min(hs)))
          .otherwise(transform(sequence(lit(1), n - window + 1),
            i => array_min(slice(hs, i, lit(window)))))
      })))
    }
    val rnd = new scala.util.Random(17)
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens: empty, sub-window, and long
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    }.toDF("id", "text")
    for ((k, w) <- Seq((3, 4), (2, 3), (1, 1), (4, 7))) {
      val mismatches = docs
        .select(Dedup.winnowFps($"text", k, w).as("fast"),
          declarative($"text", k, w).as("slow"))
        .filter(not(array_sort($"fast") <=> array_sort($"slow")))
        .count()
      assert(mismatches == 0L,
        s"kernel diverges from the declarative formula at k=$k w=$w")
    }
  }

  test("winnowingFingerprints: NULL text contributes nothing (no [null] fp row)") {
    // size(null _h) = -1 under legacy sizeOfNull; without the null guard
    // the n < window branch emits array(array_min(null)) = [null] — an
    // (id, NULL) fingerprint row that WinnowIndex's xxhash64(fp) maps to
    // the seed, falsely bucketing every null-text doc together
    val df = Seq[(Long, String)]((1L, "a b c d e"), (2L, null), (3L, null))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(df, "doc_id", "text",
        shingleLen = 3, window = 4)
      .as[(Long, String)].collect()
    assert(fps.forall(_._2 != null), "no NULL fingerprint rows")
    assert(fps.map(_._1).toSet == Set(1L), "null-text docs contribute nothing")
    val pairs = Dedup.winnowingPairs(df, "doc_id", "text", minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.isEmpty, "null-text docs must not match each other")
  }

  test("editDistancePairs: typo pairs found, length filter lossless, cap drops hot blocks") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fax"),   // ed 1 from doc 1
      (3L, "the quick brown foxes"), // ed 2 from doc 1, ed 3 from doc 2
      (4L, "completely different"),
      (5L, "xx")                     // len diff > maxEdits from all others
    ).toDF("id", "title")
    val pairs = Dedup.editDistancePairs(df, "id", "title", maxEdits = 3,
        maxDocsPerBlock = Int.MaxValue)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 3L)))
    // blocking: put doc 3 in its own block -> its pairs vanish, 1-2 stays
    val blocked = Dedup.editDistancePairs(
      df.withColumn("blk", when($"id" === 3L, "b").otherwise("a")),
      "id", "title", maxEdits = 3, blockCol = Some("blk"),
      maxDocsPerBlock = Int.MaxValue)
      .as[(Long, Long, Long)].collect()
    assert(blocked.toSeq == Seq((1L, 2L, 1L)))
    // cap applies per (block, length-bucket) — the join's own granularity
    // (r12 weak #1): lengths 19/19/21/20/2 under maxEdits=3 land in
    // buckets 6/6/7/6/0, so cap=2 keeps {1,2} of bucket 6, {3}, {5} —
    // doc 4 (the hot bucket's 3rd id) drops, every pair survives
    val capped = Dedup.editDistancePairs(df, "id", "title", maxEdits = 3,
      maxDocsPerBlock = 2)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(capped.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 3L)))
    // doc 3 sits BEYOND the hot bucket's 2-lowest-id horizon and still
    // pairs from its own bucket — the pre-r13 global cap (2 lowest ids of
    // the whole corpus) could only have produced (1,2)
    assert(capped.exists(_._2 == 3L),
      "a doc past the hot bucket's cap must still match from its own bucket")
  }

  test("editDistanceAgainst: batch-vs-corpus pairs; cap hits the corpus side only") {
    val corpus = Seq((1L, "the quick brown fox"), (2L, "wholly other words"),
      (3L, "the quick brown fog")).toDF("id", "title")
    val batch = Seq((10L, "the quick brown fax"), (11L, "zz")).toDF("id", "title")
    val out = Dedup.editDistanceAgainst(batch, corpus, "id", "title",
        maxEdits = 2, maxDocsPerBlock = Int.MaxValue)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(out.toSeq == Seq((10L, 1L, 1L), (10L, 3L, 2L)))
    // all three corpus titles share length bucket 9 (lens 19/18/19 under
    // maxEdits=2), so cap=2 keeps the bucket's lowest ids 1,2 — doc 3
    // drops; the batch side is never capped
    val capped = Dedup.editDistanceAgainst(batch, corpus, "id", "title",
        maxEdits = 2, maxDocsPerBlock = 2)
      .as[(Long, Long, Long)].collect()
    assert(capped.toSeq == Seq((10L, 1L, 1L)))
  }

  test("winnowingPairs: a shared run of >= w+k-1 tokens is always caught") {
    // d1 and d2 share a 7-token run (w=4, k=3 -> guarantee at w+k-1=6);
    // d3 is unrelated
    val df = Seq(
      (1L, "x1 x2 p q r s t u v x3"),
      (2L, "y1 p q r s t u v y2 y3"),
      (3L, "m n o zz ww qq rr")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(df, "doc_id", "text", minShared = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.toSeq.contains((1L, 2L)),
      "the winnowing guarantee must surface the shared passage")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}

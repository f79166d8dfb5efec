package graft.ml

import graft.SparkSpec
import graft.operators.{Dedup, Knn}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md F5-style ANN recall harness (reference
  * tests/performance_demo_hnsw.py:35-101 tests HNSW recall vs brute force;
  * here the IVF path plays that role).
  */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id".as("id"), $"embedding".as("vector")).cache()

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(emb, "id", "vector", p, nLists = 16, maxIter = 10)
    p
  }

  private def bruteTopK(queryVec: Seq[Double], k: Int): Seq[Long] =
    Knn.topK(emb, queryVec, k).select($"id").collect().map(_.getLong(0)).toSeq

  test("build writes partitioned data and loadable centroids") {
    val idx = IvfIndex.load(spark, indexPath)
    assert(idx.centroids.length == 16)
    val lists = spark.read.parquet(s"$indexPath/data")
      .select($"list_id").distinct().count()
    assert(lists > 1, "expect multiple populated lists")
    // partition pruning: probing must read fewer partitions than the total
    assert(spark.read.parquet(s"$indexPath/data").count() == 500)
  }

  test("recall@10 vs brute force: beats random-probe baseline, monotone, >=0.9 at 12/16") {
    // the testdata embeddings are near-random (max pairwise cosine ~0.48), so
    // IVF recall ~ probed fraction + concentration gain; assert the honest
    // properties rather than a number the data can't support.
    val idx = IvfIndex.load(spark, indexPath)
    val rnd = new scala.util.Random(7)
    val queryIds = Seq.fill(20)(rnd.nextInt(500).toLong)
    val vecs = emb.filter($"id".isin(queryIds: _*))
      .collect().map(r => r.getSeq[Float](1).map(_.toDouble))
    def meanRecall(nProbe: Int): Double = {
      val rs = vecs.map { q =>
        val exact = bruteTopK(q, 10).toSet
        val ann = idx.search(q, 10, nProbe).select($"id")
          .collect().map(_.getLong(0)).toSet
        (exact intersect ann).size / 10.0
      }
      rs.sum / rs.size
    }
    val r4 = meanRecall(4); val r8 = meanRecall(8); val r12 = meanRecall(12)
    assert(r4 > 4.0 / 16 + 0.1, s"recall@nProbe=4 ($r4) should beat random probing")
    assert(r8 > 8.0 / 16 + 0.1, s"recall@nProbe=8 ($r8) should beat random probing")
    assert(r4 <= r8 + 0.05 && r8 <= r12 + 0.05, s"recall should be monotone: $r4, $r8, $r12")
    assert(r12 >= 0.9, s"recall@nProbe=12 = $r12")
  }

  test("full probe (nProbe = nLists) equals exact search") {
    val idx = IvfIndex.load(spark, indexPath)
    val q = emb.filter($"id" === 123).head().getSeq[Float](1).map(_.toDouble)
    val exact = bruteTopK(q, 10)
    val ann = idx.search(q, 10, nProbe = 16).select($"id")
      .collect().map(_.getLong(0)).toSeq
    assert(ann == exact)
  }

  test("batch search: each stored query ranks itself first; recall tracks single") {
    val idx = IvfIndex.load(spark, indexPath)
    val queries = emb.filter($"id" < 10)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val res = idx.searchBatch(queries, k = 5, nProbe = 8)
    val rank1 = res.filter($"rank" === 1).collect()
    assert(rank1.length == 10)
    assert(rank1.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("id")))
  }

  test("probed single search reads only probed partitions (pruned scan)") {
    val idx = IvfIndex.load(spark, indexPath)
    val q = emb.filter($"id" === 7).head().getSeq[Float](1).map(_.toDouble)
    val df = spark.read.parquet(s"$indexPath/data").filter($"list_id".isin(0, 1))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") || plan.contains("list_id"),
      s"expected partition pruning evidence in plan:\n$plan")
  }

  test("batch search prunes the store scan to the probed lists") {
    val idx = IvfIndex.load(spark, indexPath)
    val queries = emb.filter($"id" < 4)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val res = idx.searchBatch(queries, k = 3, nProbe = 2)
    val plan = res.queryExecution.executedPlan.toString()
    // the store scan must carry a list_id partition filter (IN over the
    // union of probed lists), not read every list
    val scanFilter = "PartitionFilters: \\[.*list_id.*IN".r
    assert(scanFilter.findFirstIn(plan).isDefined,
      s"expected list_id IN partition filter on the store scan in:\n$plan")
  }

  test("embedding near-dup LSH matches exact on planted duplicates") {
    val rnd = new scala.util.Random(3)
    val base = Seq.fill(50)(Array.fill(16)(rnd.nextGaussian().toFloat))
    // plant near-dups: ids 100+i is a tiny perturbation of i for i < 10
    val rows =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
        (0 until 10).map { i =>
          (100L + i, base(i).map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq)
        }
    val df = rows.toDF("id", "vec")
    val exact = Dedup.embeddingNearDupExact(df, "id", "vec", 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(df, "id", "vec", 0.98, dim = 16,
        nBits = 64, nBands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 10, s"expected planted pairs, got ${exact.size}")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("incremental append: new vectors searchable without rebuild") {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    IvfIndex.build(emb.filter($"id" < 400), "id", "vector", p, nLists = 8)
    val idx = IvfIndex.load(spark, p)
    val newRows = emb.filter($"id" >= 400)
    assert(idx.append(newRows) == 100)
    assert(spark.read.parquet(s"$p/data").count() == 500)
    // an appended vector must be findable (full probe = exact)
    val q = emb.filter($"id" === 450).head().getSeq[Float](1).map(_.toDouble)
    val top = idx.search(q, 1, nProbe = 8).select($"id").head().getLong(0)
    assert(top == 450L)
    // list stats cover all lists and sum to the corpus
    val stats = idx.listStats().collect()
    assert(stats.map(_.getAs[Long]("n_vectors")).sum == 500L)
  }

  test("maintenance: append drift flips needsRebuild; fresh build is healthy") {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_maint").toString
    IvfIndex.build(emb.filter($"id" < 400), "id", "vector", p, nLists = 8)
    val idx = IvfIndex.load(spark, p)

    val fresh = idx.maintenance()
    assert(fresh.nVectors == 400L)
    assert(fresh.nAtBuild.contains(400L))
    assert(fresh.appendedFraction == 0.0)
    assert(!fresh.needsRebuild,
      s"fresh k-means build should be healthy: $fresh")

    // drift: append every vector 5x over — 5/6 of the store now post-dates
    // the frozen quantizer, tripping the appended-fraction signal
    (1 to 5).foreach { i =>
      idx.append(emb.filter($"id" < 400)
        .select(($"id" + i * 1000).as("id"), $"vector"))
    }
    val drifted = idx.maintenance()
    assert(drifted.nVectors == 2400L)
    assert(drifted.appendedFraction > 0.8)
    assert(drifted.needsRebuild, s"appended-fraction drift must flip: $drifted")

    // imbalance alone also flips it: deterministic hoarding — euclidean
    // metric, centroid 0 at the data region, the rest absurdly far away,
    // so EVERY row assigns to list 0 and imbalance reads nLists = 8
    val p2 = java.nio.file.Files.createTempDirectory("graft_ivf_skew").toString
    val cents = Array(Array.fill(64)(0.0)) ++
      (1 until 8).map(i => Array.fill(64)(1e6 * i))
    IvfIndex.buildWithCentroids(emb, "id", "vector", p2, cents,
      metric = graft.functions.vector.MetricEuclidean)
    val skewed = IvfIndex.load(spark, p2,
      metric = graft.functions.vector.MetricEuclidean).maintenance()
    assert(skewed.imbalance > IvfIndex.DefaultMaxImbalance,
      s"hoarding centroid should trip imbalance: $skewed")
    assert(skewed.needsRebuild)
    assert(skewed.appendedFraction == 0.0)
  }

  test("metric is index state: persisted at build, restored by bare load") {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_metric").toString
    IvfIndex.build(emb, "id", "vector", p, nLists = 4,
      metric = graft.functions.vector.MetricEuclidean, maxIter = 2)
    val idx = IvfIndex.load(spark, p)
    assert(idx.metric == graft.functions.vector.MetricEuclidean,
      "a euclidean-built index reloaded bare must NOT fall back to cosine")
  }

  test("load with a mismatched explicit metric fails fast") {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_metric2").toString
    IvfIndex.build(emb, "id", "vector", p, nLists = 4,
      metric = graft.functions.vector.MetricEuclidean, maxIter = 2)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.load(spark, p, graft.functions.vector.MetricCosine)
    }
    assert(e.getMessage.contains("metric"))
    // a MATCHING explicit metric is fine
    val ok = IvfIndex.load(spark, p, graft.functions.vector.MetricEuclidean)
    assert(ok.metric == graft.functions.vector.MetricEuclidean)
  }

  test("searchAdaptive: cardinality picks the plan — selective filters get " +
      "exact pre-filtered results, broad filters the probed path") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_ad").toString
    val store = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vector"),
        map(lit("lowid"), when($"vec_id" < 50, "y").otherwise("n"),
          lit("par"), ($"vec_id" % 2).cast("string")).as("meta"))
    val cents = store.filter($"id" < 8).orderBy($"id").select($"vector")
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val idx = IvfIndex.buildWithCentroids(store, "id", "vector", root, cents)
    val qv = store.filter($"id" === 0).select($"vector").head()
      .getSeq[Float](0).map(_.toDouble).toSeq
    // the decision is pure and boundary-exact
    assert(IvfIndex.chooseFilterPath(100, 100) == IvfIndex.PathPrefilterExact)
    assert(IvfIndex.chooseFilterPath(101, 100) == IvfIndex.PathIvfPostfilter)
    // selective: 50 matches <= cap -> pre-filter, EXACT under the filter
    val sel = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("lowid" -> "y"), preFilterCap = 100)
    assert(sel.path == IvfIndex.PathPrefilterExact && sel.matches == 50)
    val want = Knn.topK(
      store.filter(element_at($"meta", "lowid") === "y"), qv, 5)
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(sel.hits.select($"id").collect().map(_.getLong(0)).toSeq == want)
    // broad: 250 matches > cap -> identical to the probed search() path
    val broad = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("par" -> "1"), preFilterCap = 100)
    assert(broad.path == IvfIndex.PathIvfPostfilter && broad.matches == 250)
    val viaSearch = idx.search(qv, 5, nProbe = 4,
      metadataFilter = Map("par" -> "1"))
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(broad.hits.select($"id").collect()
      .map(_.getLong(0)).toSeq == viaSearch)
    // matches <= k: all matches return without the underfill full rescan
    val tiny = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("lowid" -> "y"),
      predicate = Some($"id" < 3), preFilterCap = 100)
    assert(tiny.path == IvfIndex.PathPrefilterExact && tiny.matches == 3)
    assert(tiny.hits.count() == 3)
    // unfiltered adaptive search is a contract violation, loudly
    intercept[IllegalArgumentException](idx.searchAdaptive(qv, 5))
    // a matchCount hint is authoritative: a hint on the other side of
    // the cap flips the plan, proving no count job second-guesses it
    val hinted = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("par" -> "1"), preFilterCap = 100,
      matchCount = Some(5L))
    assert(hinted.path == IvfIndex.PathPrefilterExact &&
      hinted.matches == 5L)
    assert(hinted.hits.select($"id").collect()
      .map(_.getLong(0)).toSeq == Knn.topK(
        store.filter(element_at($"meta", "par") === "1"), qv, 5)
      .select($"id").collect().map(_.getLong(0)).toSeq,
      "the hinted prefilter path is still the exact filtered top-k")
    // a matchBound at or under the cap proves prefilter-exact with NO
    // count job, and the reported matches is the OBSERVED exact count
    // (not the bound): bound 80 >= true 50
    val bounded = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("lowid" -> "y"), preFilterCap = 100,
      matchBound = Some(80L))
    assert(bounded.path == IvfIndex.PathPrefilterExact &&
      bounded.matches == 50L,
      s"bound plans the path, observation reports the truth: $bounded")
    assert(bounded.hits.select($"id").collect().map(_.getLong(0)).toSeq
      == want)
    // a bound ABOVE the cap proves nothing: the live count decides (250
    // matches > cap -> probed), never a silent prefilter on a loose bound
    val loose = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("par" -> "1"), preFilterCap = 100,
      matchBound = Some(5000L))
    assert(loose.path == IvfIndex.PathIvfPostfilter && loose.matches == 250L)
    // an UNSOUND bound (<= cap but under the TRUE count) is trusted for
    // the plan — that is the no-count-job point — detected inside the
    // pass, and surfaced PROGRAMMATICALLY: boundViolated = true with
    // results still exact (the log line alone cannot be consumed by code)
    val unsound = idx.searchAdaptive(qv, k = 5, nProbe = 4,
      metadataFilter = Map("par" -> "1"), preFilterCap = 100,
      matchBound = Some(100L))
    assert(unsound.path == IvfIndex.PathPrefilterExact &&
      unsound.matches == 250L && unsound.boundViolated,
      s"an unsound bound must set boundViolated: $unsound")
    assert(unsound.hits.select($"id").collect().map(_.getLong(0)).toSeq ==
      Knn.topK(store.filter(element_at($"meta", "par") === "1"), qv, 5)
        .select($"id").collect().map(_.getLong(0)).toSeq,
      "results stay exact under an unsound bound")
    // every sound outcome reads false (honest default on all paths)
    assert(!sel.boundViolated && !broad.boundViolated &&
      !hinted.boundViolated && !bounded.boundViolated && !loose.boundViolated)
  }

  test("filtered searchBatch: the filter composes with list pruning — " +
      "full probe equals the exact filtered batch, the probed plan keeps " +
      "the list_id partition filter and stays product-free") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_fb").toString
    val store = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vector"),
        map(lit("par"), ($"vec_id" % 2).cast("string")).as("meta"))
    val cents = store.filter($"id" < 8).orderBy($"id").select($"vector")
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val idx = IvfIndex.buildWithCentroids(store, "id", "vector", root, cents)
    val queries = store.filter($"id" < 4)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    // full probe: pre-filtering inside every list IS the exact filtered
    // batch (string filter and the equivalent predicate agree)
    val exact = Knn.batchTopK(queries,
        store.filter(element_at($"meta", "par") === "1"), 5)
      .select($"query_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaFilter = idx.searchBatch(queries, 5, nProbe = 8,
        metadataFilter = Map("par" -> "1"))
      .select($"query_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaFilter == exact, "full-probe filtered batch must be exact")
    val viaPred = idx.searchBatch(queries, 5, nProbe = 8,
        predicate = Some(element_at($"meta", "par") === "1"))
      .select($"query_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaPred == exact, "predicate form must equal the string form")
    // plan shape at partial probe: the filter must not defeat the
    // list_id pruning, and the batch join stays an equi-join (no
    // product, no nested loop — the 100 TB shape)
    val plan = idx.searchBatch(queries, 5, nProbe = 2,
        metadataFilter = Map("par" -> "1"))
      .queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[.*list_id.*IN".r.findFirstIn(plan).isDefined,
      s"filtered batch must keep the list_id partition filter:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"filtered batch must stay equi-joined:\n$plan")
  }

  test("pairPredicate searchBatch: heterogeneous per-query filters — " +
      "full probe equals each query's OWN exact constrained top-k, the " +
      "plan keeps list_id pruning and stays product-free") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_pp").toString
    val store = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vector"),
        map(lit("label"), $"label".cast("string")).as("meta"))
    val cents = store.filter($"id" < 8).orderBy($"id").select($"vector")
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val idx = IvfIndex.buildWithCentroids(store, "id", "vector", root, cents)
    // each query carries its OWN label rider — the q92 mining shape
    val queries = store.filter($"id" < 4)
      .select($"id".as("query_id"), $"vector".as("query_vec"),
        element_at($"meta", "label").as("query_label"))
    val pp = element_at($"meta", "label") =!= $"query_label"
    val got = idx.searchBatch(queries, 5, nProbe = 8, pairPredicate = Some(pp))
      .select($"query_id", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // exact truth per query: brute-force top-5 over the OTHER-label rows
    val want = queries.collect().flatMap { q =>
      val qid = q.getLong(0)
      val ql = q.getString(2)
      Knn.batchTopK(
          queries.filter($"query_id" === qid).drop("query_label"),
          store.filter(element_at($"meta", "label") =!= ql), 5)
        .select($"query_id", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }.sorted.toSeq
    assert(got == want, "per-query constrained batch must be exact at full probe")
    // queries with DIFFERENT labels must get DIFFERENT candidate pools —
    // the heterogeneity the shared-filter surface cannot express
    val labels = queries.select($"query_label").distinct().count()
    assert(labels >= 2, "construction needs at least two query labels")
    val plan = idx.searchBatch(queries, 5, nProbe = 2, pairPredicate = Some(pp))
      .queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[.*list_id.*IN".r.findFirstIn(plan).isDefined,
      s"pair-filtered batch must keep the list_id partition filter:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"pair-filtered batch must stay equi-joined:\n$plan")
  }

  test("tuneNProbe: the derived sweep equals measured per-depth recall " +
      "exactly (the total-order derivation theorem, checked in code)") {
    val idx = IvfIndex.load(spark, indexPath)
    val queries = emb.filter($"id" >= 100 && $"id" < 130)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val tuning = idx.tuneNProbe(queries, k = 10, targetRecall = 0.9)
    val derived = tuning.sweep.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(derived.size == 16, "one sweep row per depth 1..nLists")
    // the expensive cross-check: re-search at each depth and measure — the
    // derived counts must match EXACTLY, not approximately (ties break by
    // the same (score DESC, id ASC) order on both sides)
    val exact = idx.searchBatch(queries, k = 10, nProbe = 16)
      .localCheckpoint(true)
    for (p <- Seq(1, 2, 3, 5, 8, 16)) {
      val measured = Recall.summarize(
          Recall.recallAtK(idx.searchBatch(queries, 10, nProbe = p), exact))
        .head()
      val (dHit, dExact, dRecall) = derived(p.toLong)
      assert(dHit == measured.getLong(0) && dExact == measured.getLong(1),
        s"depth $p: derived ($dHit/$dExact) != measured " +
          s"(${measured.getLong(0)}/${measured.getLong(1)})")
      assert(math.abs(dRecall - measured.getDouble(2)) < 1e-12)
    }
    // full probe is exact by construction
    assert(derived(16L)._3 == 1.0)
  }

  test("tuneNProbe: suggestion is the smallest depth meeting the target; " +
      "unreachable targets suggest nothing rather than lie") {
    val idx = IvfIndex.load(spark, indexPath)
    val queries = emb.filter($"id" < 20)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val t9 = idx.tuneNProbe(queries, k = 10, targetRecall = 0.9)
    val rows = t9.sweep.collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
    assert(t9.suggestedNProbe.isDefined)
    val s = t9.suggestedNProbe.get
    assert(rows.filter(_._3).map(_._1) sameElements Array(s.toLong),
      "chosen must mark exactly the suggested row")
    assert(rows.find(_._1 == s).get._2 >= 0.9)
    assert(rows.filter(_._1 < s).forall(_._2 < 0.9),
      "every shallower depth must miss the target")
    // recall 1.0 is always reachable at full probe
    assert(idx.tuneNProbe(queries, 10, targetRecall = 1.0)
      .suggestedNProbe.isDefined)
    // cap the sweep below the depth the target needs: no suggestion, no
    // chosen row — the honest answer
    val capped = idx.tuneNProbe(queries, 10, targetRecall = 1.0, maxProbe = 1)
    if (capped.sweep.filter($"recall" >= 1.0).isEmpty) {
      assert(capped.suggestedNProbe.isEmpty)
      assert(capped.sweep.filter($"chosen").isEmpty)
    }
    // n_exact: 20 queries x k=10 on a 500-row store
    assert(t9.nExact == 200L)
  }

  test("tuneNProbe: guards and the vacuous empty-query convention") {
    val idx = IvfIndex.load(spark, indexPath)
    val queries = emb.filter($"id" < 5)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    intercept[IllegalArgumentException] {
      idx.tuneNProbe(queries, 10, targetRecall = 0.0)
    }
    intercept[IllegalArgumentException] {
      idx.tuneNProbe(queries, 10, targetRecall = 1.5)
    }
    intercept[IllegalArgumentException] {
      idx.tuneNProbe(queries, 10, targetRecall = 0.9, maxProbe = 17)
    }
    val empty = idx.tuneNProbe(queries.filter($"query_id" < 0), 10, 0.9)
    assert(empty.nExact == 0L)
    assert(empty.suggestedNProbe.contains(1),
      "vacuous recall is 1.0 at every depth (the Recall.summarize " +
        "convention), so depth 1 meets any target")
    assert(empty.sweep.collect().forall(_.getDouble(3) == 1.0))
  }

  test("assignmentDrift: a self-batch reads PSI exactly 0; a one-list " +
      "concentrate trips the major-shift verdict") {
    val idx = IvfIndex.load(spark, indexPath)
    // the store's own rows are, by definition, distributed like the store:
    // every clamped proportion pair is equal, every term is exactly 0.0
    val self = idx.assignmentDrift(emb)
    assert(self.psiX1e6 == 0L && !self.drifted)
    assert(self.nStore == 500L && self.nBatch == 500L)
    val perList = self.perList.collect()
    assert(perList.length == 16, "one row per centroid, empties included")
    assert(perList.forall(_.getLong(5) == 0L))
    // a batch drawn entirely from one list's rows is the textbook major
    // shift: its proportion mass sits on one list, everything else clamps
    val oneList = spark.read.parquet(s"$indexPath/data")
      .filter($"list_id" === 0).select($"id", $"vector")
    if (oneList.count() > 0) {
      val d = idx.assignmentDrift(oneList)
      assert(d.drifted, s"one-list batch must trip maxPsi: psi=${d.psiX1e6}")
      assert(d.psiX1e6 > 250000L)
      // PSI terms are nonnegative by construction (same-sign factors)
      assert(d.perList.collect().forall(_.getLong(5) >= 0L))
    }
  }

  test("assignmentDrift: guards — empty sides and bad epsilon are loud") {
    val idx = IvfIndex.load(spark, indexPath)
    intercept[IllegalArgumentException] {
      idx.assignmentDrift(emb.filter($"id" < 0))
    }
    intercept[IllegalArgumentException] {
      idx.assignmentDrift(emb, epsilon = 0.0)
    }
    intercept[IllegalArgumentException] {
      idx.assignmentDrift(emb, epsilon = 1.0)
    }
  }
}

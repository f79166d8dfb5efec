package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfPqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id".as("id"), $"embedding".as("vector")).cache()

  private def asDouble(v: Seq[Float]): Array[Double] = v.map(_.toDouble).toArray

  // fixed twin: 4 coarse lists from rows 0..3, codebooks from rows 0..15
  private lazy val fixedIndex = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivfpq_fixed").toString
    val cents = emb.filter($"id" < 4).orderBy($"id")
      .as[(Long, Seq[Float])].collect().map(r => asDouble(r._2))
    IvfPq.buildFixed(emb, "id", "vector", p, cents,
      numSubspaces = 8, codebookSize = 16)
  }

  test("fixed-twin pruned ADC equals a driver-side replay of assign+probe+ADC") {
    val queries = emb.filter($"id" >= 100 && $"id" < 104)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val got = IvfPq.searchBatchAdc(fixedIndex, queries, k = 5, nProbe = 2)
      .select($"query_id", $"id", $"rank").as[(Long, Long, Long)]
      .collect().toSet

    val model = fixedIndex.model
    val cents = (0 until 4).map(i => fixedIndex.ivf.centroids(i)).toArray
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    val all = emb.as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, asDouble(v)) }
    def assign(v: Array[Double]): Int =
      cents.zipWithIndex.minBy { case (c, i) => (sqDist(c, v), i) }._2
    def codesOf(v: Array[Double]): Array[Int] =
      (0 until model.numSubspaces).map { m =>
        (0 until model.codebookSize).minBy { k =>
          val c = model.centroid(m, k)
          (sqDist(c, java.util.Arrays.copyOfRange(v, m * model.subDim,
            (m + 1) * model.subDim)), k)
        }
      }.toArray
    val byList = all.groupBy { case (_, v) => assign(v) }
    val qs = all.filter { case (id, _) => id >= 100 && id < 104 }
    val expect = qs.flatMap { case (qid, qv) =>
      val probes = cents.zipWithIndex
        .sortBy { case (c, i) => (sqDist(c, qv), i) }.take(2).map(_._2)
      val adc = probes.flatMap(l => byList.getOrElse(l, Array.empty))
        .map { case (id, v) =>
          val cs = codesOf(v)
          var d = 0.0
          for (m <- 0 until model.numSubspaces) {
            val cent = model.centroid(m, cs(m))
            var j = 0
            while (j < model.subDim) {
              val diff = qv(m * model.subDim + j) - cent(j)
              d += diff * diff
              j += 1
            }
          }
          (id, d)
        }
      adc.sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, id, (i + 1).toLong) }
    }.toSet
    assert(got == expect)
  }

  test("ADC scan is partition-pruned to the probed lists") {
    val queries = emb.filter($"id" < 2)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val plan = IvfPq.searchBatchAdc(fixedIndex, queries, k = 3, nProbe = 1)
      .queryExecution.executedPlan.toString
    // the parquet scan must carry a list_id partition filter, not read all
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"expected a list_id partition filter in:\n$plan")
    // the rerank float gather must be pruned the same way (both scans)
    val rerankPlan = IvfPq.searchRerankBatch(fixedIndex, queries, k = 3,
        nProbe = 1).queryExecution.executedPlan.toString
    val prunedScans = rerankPlan.linesIterator.count(l =>
      l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []") &&
        l.contains("list_id"))
    assert(prunedScans >= 2,
      s"expected both codes and vector scans list_id-pruned:\n$rerankPlan")
  }

  test("fail-fast query cap") {
    val queries = emb.limit(5)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val e = intercept[IllegalArgumentException] {
      IvfPq.searchBatchAdc(fixedIndex, queries, k = 3, maxQueries = 4)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("append encodes against frozen codebooks; appended rows are searchable") {
    val p = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    val base = emb.filter($"id" < 400)
    val index = IvfPq.build(base, "id", "vector", p,
      nLists = 8, numSubspaces = 8, codebookSize = 16, maxIter = 5)
    val extra = emb.filter($"id" >= 400)
    val n = IvfPq.append(index, extra)
    assert(n == 100)
    // an appended row queried by its own vector must rank itself first
    val q = emb.filter($"id" === 450)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val top = IvfPq.searchRerankBatch(index, q, k = 3, nProbe = 8)
      .filter($"rank" === 1).select($"id").head().getLong(0)
    assert(top == 450L)
    // codes table grew consistently
    assert(spark.read.parquet(index.codesPath).count() == 500)
  }

  test("trained index: rerank recovers recall lost by pruning+quantization; " +
      "residual+metric-matched codes beat raw-vector codes") {
    val queries = emb.filter($"id" < 16)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val exact = graft.operators.Knn.batchTopK(queries, emb.toDF(), k = 10)
      .select($"query_id", $"id")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      Recall.summarize(Recall.recallAtK(df.select($"query_id", $"id"), exact))
        .head().getDouble(2)

    val pRes = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val index = IvfPq.build(emb, "id", "vector", pRes,
      nLists = 16, numSubspaces = 8, codebookSize = 16, maxIter = 5)
    assert(index.residual, "learned builds default to residual encoding")
    val rAdc = recallOf(IvfPq.searchBatchAdc(index, queries, k = 10, nProbe = 12))
    val rRer = recallOf(IvfPq.searchRerankBatch(index, queries, k = 10,
      nProbe = 12, overFetch = 4))

    val pRaw = java.nio.file.Files.createTempDirectory("graft_ivfpq_raw").toString
    val rawIndex = IvfPq.build(emb, "id", "vector", pRaw,
      nLists = 16, numSubspaces = 8, codebookSize = 16, maxIter = 5,
      residual = false)
    val rAdcRaw = recallOf(IvfPq.searchBatchAdc(rawIndex, queries, k = 10, nProbe = 12))
    info(f"IVF-PQ recall@10 vs exact cosine (nProbe=12/16): " +
      f"residual adc=$rAdc%.3f reranked=$rRer%.3f | raw adc=$rAdcRaw%.3f")
    assert(rRer >= rAdc, "re-rank must not lose recall")
    assert(rAdc > rAdcRaw,
      f"residual ADC recall $rAdc%.3f must beat raw-vector ADC $rAdcRaw%.3f")
    assert(rRer > 0.5, s"re-ranked recall $rRer unreasonably low")
  }

  test("clustered corpus: residual coding's lift grows with cluster structure") {
    // the synthetic sf corpus is near-uniform on the sphere (weak clusters),
    // where the mean-basis residual gain is structurally small; plant REAL
    // clusters (8 anchors, points = anchor + small noise, normalized) and
    // the residual codebooks only have to cover the small noise ball while
    // raw codebooks must cover the whole sphere — the by_residual=true
    // advantage the object doc promises
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val anchors = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val pts = (0 until 400).map { i =>
      val a = anchors(i % 8)
      (i.toLong, unit(a.map(_ + 0.15 * rnd.nextGaussian())))
    }
    val corpus = pts.toDF("id", "vector")
    val queries = corpus.filter($"id" < 16)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    val exact = graft.operators.Knn.batchTopK(queries, corpus, k = 10)
      .select($"query_id", $"id")
    def adcRecall(residual: Boolean): Double = {
      val p = java.nio.file.Files.createTempDirectory("graft_ivfpq_clus").toString
      val idx = IvfPq.build(corpus, "id", "vector", p, nLists = 8,
        numSubspaces = 8, codebookSize = 16, maxIter = 5, residual = residual)
      Recall.summarize(Recall.recallAtK(
        IvfPq.searchBatchAdc(idx, queries, k = 10, nProbe = 8)
          .select($"query_id", $"id"), exact)).head().getDouble(2)
    }
    val res = adcRecall(residual = true)
    val raw = adcRecall(residual = false)
    info(f"clustered-corpus ADC recall@10 (full probe): residual=$res%.3f raw=$raw%.3f")
    assert(res >= raw + 0.1,
      f"expected a material residual lift on clustered data: residual=$res%.3f raw=$raw%.3f")
  }

  test("residual flag round-trips through load; loaded search is identical") {
    val p = java.nio.file.Files.createTempDirectory("graft_ivfpq_resload").toString
    val index = IvfPq.build(emb.filter($"id" < 200), "id", "vector", p,
      nLists = 4, numSubspaces = 8, codebookSize = 16, maxIter = 3)
    val loaded = IvfPq.load(spark, p)
    assert(loaded.residual, "residual flag must persist through load")
    assert(loaded.ivf.metric == graft.functions.vector.MetricCosine)
    val queries = emb.filter($"id" < 4)
      .select($"id".as("query_id"), $"vector".as("query_vec"))
    def run(i: IvfPq.Index) =
      IvfPq.searchBatchAdc(i, queries, k = 5, nProbe = 2)
        .select($"query_id", $"id", $"rank", $"adc")
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(run(loaded) == run(index),
      "a loaded residual index must search bit-identically to the built one")
    assert(!fixedIndex.residual, "the oracle twin stays by_residual=false")
    // pre-residual layouts (no `residual` column in pqmodel) load as
    // by_residual=false — rewrite the fixed twin's pqmodel without the
    // column to emulate an index written before the flag existed
    val legacy = java.nio.file.Files.createTempDirectory("graft_ivfpq_legacy").toString
    val pm = spark.read.parquet(s"${fixedIndex.path}/pqmodel").drop("residual")
      .localCheckpoint(true)
    pm.coalesce(1).write.mode("overwrite").parquet(s"$legacy/pqmodel")
    // point the ivf + codes halves at the fixed twin's real layouts
    import java.nio.file.{Files, Paths}
    Files.createSymbolicLink(Paths.get(s"$legacy/ivf"),
      Paths.get(s"${fixedIndex.path}/ivf"))
    Files.createSymbolicLink(Paths.get(s"$legacy/codes"),
      Paths.get(s"${fixedIndex.path}/codes"))
    assert(!IvfPq.load(spark, legacy).residual,
      "a pqmodel without the residual column must load as by_residual=false")
  }

  test("bare load restores the build metric (euclidean is not lost to cosine)") {
    // buildFixed defaults to euclidean; a bare load used to default the
    // metric to cosine, silently re-ranking under the wrong geometry
    val loaded = IvfPq.load(spark, fixedIndex.path)
    assert(loaded.ivf.metric == graft.functions.vector.MetricEuclidean)
    val e = intercept[IllegalArgumentException] {
      IvfPq.load(spark, fixedIndex.path, graft.functions.vector.MetricCosine)
    }
    assert(e.getMessage.contains("metric"))
  }
}

package graft.operators

import graft.functions.vector
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein,
  * SIGIR 1998) — the retrieval-shaping counterpart of the engine's kNN
  * result list (reference result shaping:
  * `service/optimized_vector_store.py:187-192`): instead of the k MOST
  * similar rows, pick k rows trading relevance against redundancy —
  * each step selects argmax over the remaining candidates of
  *
  *   lambda * rel(c)  -  (1 - lambda) * max_{s in S} sim(c, s)
  *
  * (S = already-selected set; lambda = 1 degenerates to plain top-k).
  * RAG contexts assembled from plain top-k are notoriously redundant —
  * near-duplicate chunks crowd out coverage; MMR is the standard fix.
  *
  * Scale shape: candidate generation is the DISTRIBUTED leg — a
  * TakeOrderedAndProject top-N over the corpus (or any ANN index path
  * composed upstream: IVF/PQ/hyperplane all emit (id, vec, score) frames
  * that feed [[rerank]] directly). The greedy selection is INHERENTLY
  * sequential — every pick changes every remaining candidate's penalty,
  * so there is nothing to distribute — and runs driver-side over the
  * <= maxCandidates collected winners: k*N similarity evaluations of
  * plain arithmetic over a result-page-sized set, cap-guarded like
  * [[EpochIndex.sweepDropped]]. At 100 TB the corpus scan/index probe is
  * the cost; the rerank is O(k * fetchN * dim) regardless of corpus size.
  */
object Mmr {

  /** Greedy MMR selection over a scored candidate frame.
    *
    * `candidates`: (idCol LONG-castable, vecCol array<numeric>, relCol
    * DOUBLE-castable relevance — higher is better). Returns (rank, idCol):
    * rank 1..k in selection order. Ties (equal marginal score) break on
    * ascending id, so the output is deterministic and externally
    * replayable. The redundancy term uses `metric` with the engine's
    * similarity conventions ([[vector.similarity]]): cosine with the
    * eps=1e-8 clamp, dot product, or euclidean as 1/(1+d).
    */
  def rerank(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      relCol: String,
      k: Int,
      lambda: Double,
      metric: String = vector.MetricCosine,
      maxCandidates: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    val collected = candidates
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"),
        col(relCol).cast("double"))
      .limit(maxCandidates + 1) // cap-guard: never haul an unbounded set
      .collect()
    require(collected.length <= maxCandidates,
      s"rerank collected more than maxCandidates=$maxCandidates candidate " +
        "rows — MMR is a result-page operator; shrink the candidate pool " +
        "(fetchN) or raise the cap deliberately")
    val ids = collected.map(_.getLong(0))
    val vecs = collected.map(_.getSeq[Double](1).toArray)
    val rels = collected.map(_.getDouble(2))
    val n = collected.length
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val taken = new Array[Boolean](n)
    // maxSim(i) = max similarity of candidate i to the selected set so far;
    // updated incrementally per pick (the k*N term)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val pen = if (chosen.isEmpty) 0.0 else (1.0 - lambda) * maxSim(i)
          val s = lambda * rels(i) - pen
          // strict improvement, or equal score with a smaller id (ids may
          // arrive in any order, so the tie-break must compare explicitly)
          if (s > bestScore || (s == bestScore && best >= 0 && ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      taken(best) = true
      chosen += best
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = simScalar(metric, vecs(j), vecs(best))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    val out = chosen.zipWithIndex.map { case (i, r) =>
      Row((r + 1).toLong, ids(i), rels(i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField(relCol, DoubleType, nullable = false))))
  }

  /** Corpus-to-context MMR search: distributed top-`fetchN` by `metric`
    * against `queryVec` (the [[Knn.topK]] candidate discipline — broadcast
    * query, TakeOrderedAndProject, ascending-id tie-break), then greedy
    * [[rerank]] down to k. `fetchN` is the recall/diversity budget — the
    * over-fetch knob of the ANN path (reference discipline:
    * `service/optimized_vector_store.py:122-141`'s k*10) applied to
    * diversification.
    */
  def searchMmr(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Seq[Double],
      k: Int,
      fetchN: Int,
      lambda: Double,
      metric: String = vector.MetricCosine): DataFrame = {
    require(fetchN >= k, s"fetchN=$fetchN must be >= k=$k")
    val scored = corpus
      .withColumn("_rel", vector.similarity(col(vecCol), typedLit(queryVec), metric))
      .orderBy(col("_rel").desc, col(idCol).asc)
      .limit(fetchN)
    rerank(scored, idCol, vecCol, "_rel", k, lambda, metric,
      maxCandidates = fetchN)
      .withColumnRenamed("_rel", "relevance")
  }

  /** Diversity-aware context assembly — [[Knn.retrieveContext]] (the
    * reference's threshold + greedy length cap,
    * `integrations/mlx_lm_pipeline.py:725-765`) with MMR selection order
    * in place of raw score order: hits below `minSimilarity` are dropped,
    * the survivors are MMR-ranked, and the context takes the greedy
    * prefix of that order whose running `lengthCol` total stays within
    * `maxContextLength` (same prefix semantics as the score-ordered
    * original — an overflowing hit ends the take). Returns the input
    * columns plus `rank`, in MMR order.
    */
  def retrieveContextMmr(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      relCol: String,
      lengthCol: String,
      minSimilarity: Double,
      maxContextLength: Long,
      k: Int,
      lambda: Double,
      metric: String = vector.MetricCosine,
      maxCandidates: Int = 10000): DataFrame = {
    val eligible = candidates.filter(col(relCol) >= minSimilarity)
    val order = rerank(eligible, idCol, vecCol, relCol, k, lambda, metric,
      maxCandidates).select(col("rank"), col(idCol))
    val w = graft.functions.windows.boundedGlobal(col("rank").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    candidates.join(order, Seq(idCol))
      .withColumn("_running_len", sum(col(lengthCol)).over(w))
      .filter(col("_running_len") <= maxContextLength)
      .drop("_running_len")
      .orderBy(col("rank"))
  }

  /** Scalar twin of [[vector.similarity]] for the driver-side penalty term
    * — same conventions as the Catalyst kernels (cosine eps clamp 1e-8,
    * euclidean as 1/(1+d)) so a pipeline mixing the distributed and
    * driver legs scores consistently.
    */
  private def simScalar(metric: String, a: Array[Double], b: Array[Double]): Double =
    metric match {
      case vector.MetricCosine =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dot / (math.max(math.sqrt(na), 1e-8) * math.max(math.sqrt(nb), 1e-8))
      case vector.MetricDot =>
        var dot = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); i += 1 }
        dot
      case vector.MetricEuclidean =>
        var acc = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
        1.0 / (1.0 + math.sqrt(acc))
      case other => throw new IllegalArgumentException(
        s"unsupported metric '$other' (expected one of ${vector.SupportedMetrics.mkString(", ")})")
    }
}

package graft.operators

import graft.functions.vector
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN similarity search operators (SURVEY.md §2.3 J1/J2, §2.6 T1/T2).
  *
  * Reference semantics: score every stored vector against the query under the
  * store metric, then take the k best with deterministic ranking
  * (service/optimized_vector_store.py:149-192). Re-expressed Spark-first:
  *
  *  - single query: the query vector is a literal (driver-broadcast constant),
  *    scoring runs inside whole-stage codegen, and `orderBy().limit(k)` plans
  *    as TakeOrderedAndProject — a true distributed top-k, never a full sort.
  *  - batch query: broadcast the query set against the store (a broadcast
  *    nested-loop theta-join), then reduce to k rows per query with the
  *    bounded [[TopKAggregator]] (partial aggregation => only M*k rows cross
  *    the shuffle). A window-ranked variant is kept for oracle-checkable SQL
  *    equivalence.
  */
object Knn {

  /** Default cap on [[batchTopKBlocked]]'s driver-collected query set:
    * 16x the serving-layer batch cap (VectorStoreCatalog.MaxBatchQueries =
    * 1000, mirroring the reference's api/routes/batch_v1.py:63-64). At this
    * bound the broadcast is maxQueries x dim doubles (~8 MB at 64-dim,
    * ~128 MB at 1024-dim) and the per-partition heap state is maxQueries x k
    * entries — safely inside executor memory at local[32] or cluster
    * defaults. Beyond it, the distributed [[batchTopK]] is the right tool.
    *
    * NOTE: introducing this default cap was a BREAKING change — callers that
    * previously passed >16384 queries now fail fast and must either raise
    * `maxQueries` deliberately or switch to [[batchTopK]].
    */
  val DefaultMaxBlockedQueries: Int = 16384

  /** Conjunctive metadata equality predicate over a map<string,string> column —
    * the reference's only filter form (service/optimized_vector_store.py:159-167).
    * A string filter matches the raw value OR its TypedMeta JSON-string
    * literal, so the string-filter API keeps working on stores ingested with
    * typed encoding (where "image" is stored as "\"image\"").
    */
  def metadataPredicate(metaCol: Column, filter: Map[String, String]): Column =
    filter.foldLeft(lit(true)) { case (acc, (k, v)) =>
      acc && (metaCol(k) === lit(v) ||
        metaCol(k) === lit(graft.sources.TypedMeta.jsonString(v)))
    }

  /** Single-query kNN over a store DataFrame.
    *
    * Output: input columns + `similarity_score`, `distance`, `rank`
    * (result shaping per api/routes/vectors.py:237-258).
    */
  def topK(
      store: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      metric: String = vector.MetricCosine,
      vecCol: String = "vector",
      idCol: String = "id",
      metadataFilter: Map[String, String] = Map.empty,
      metaCol: String = "meta",
      predicate: Option[Column] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = typedLit(queryVec)
    val stringFiltered =
      if (metadataFilter.isEmpty) store
      else store.filter(metadataPredicate(col(metaCol), metadataFilter))
    // arbitrary predicate (e.g. TypedMeta.typedPredicate) composes on top
    val filtered = predicate.fold(stringFiltered)(stringFiltered.filter)
    val tieBreak =
      if (store.columns.contains(idCol)) Seq(col(idCol).asc) else Seq.empty
    val scored = filtered
      .withColumn("similarity_score", vector.similarity(col(vecCol), q, metric))
      .withColumn("distance", vector.distanceFromSimilarity(col("similarity_score"), metric))
      .orderBy(col("similarity_score").desc +: tieBreak: _*)
      .limit(k)
    // k rows at this point — the rank window is over a tiny, already-sorted set.
    scored.withColumn(
      "rank",
      graft.functions.windows.boundedRank(col("similarity_score").desc +: tieBreak: _*))
  }

  /** Batch kNN: for every row of `queries` (queryIdCol, queryVecCol), the k
    * best rows of `store`. Scale path — bounded top-k aggregation.
    *
    * `pairPredicate` is the HETEROGENEOUS per-query constraint (the
    * [[graft.ml.IvfIndex.searchBatch]] mining contract on the EXACT
    * path): a predicate over the joined (query columns × store columns)
    * row, filtering between the broadcast join and the scoring — each
    * query's top-k is then over only ITS OWN matching candidates. With it
    * set, every extra `queries` column (the riders the predicate
    * references) rides the broadcast; rider names must not collide with
    * store columns (loud here, where the caller can rename). Same plan
    * shape either way: one broadcast join, the per-pair filter inside the
    * scan stage, bounded top-k aggregation — [[labelConstrainedTopK]] is
    * the fixed-predicate special case of this.
    *
    * Output: (queryIdCol, id, similarity_score, distance, rank).
    */
  def batchTopK(
      queries: DataFrame,
      store: DataFrame,
      k: Int,
      metric: String = vector.MetricCosine,
      vecCol: String = "vector",
      idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      pairPredicate: Option[Column] = None): DataFrame = {
    val topk = udaf(new TopKAggregator(k, ascending = false))
    val qSide = pairPredicate match {
      case None => queries.select(col(queryIdCol), col(queryVecCol))
      case Some(_) =>
        val clash = queries.columns.filter(store.columns.toSet)
        require(clash.isEmpty,
          s"query columns ${clash.mkString(", ")} collide with store " +
            "columns; rename them before pairPredicate batch scoring")
        queries // riders ride the broadcast for the predicate to reference
    }
    val joined = store.crossJoin(broadcast(qSide))
    val scored = pairPredicate.fold(joined)(joined.filter)
      .select(
        col(queryIdCol),
        col(idCol),
        vector.similarity(col(vecCol), col(queryVecCol), metric).as("similarity_score"))
    scored
      .groupBy(col(queryIdCol))
      .agg(topk(col("similarity_score"), col(idCol)).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(
        col(queryIdCol),
        col("hit.id").as(idCol),
        col("hit.score").as("similarity_score"),
        vector.distanceFromSimilarity(col("hit.score"), metric).as("distance"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Label-constrained batch kNN — the contrastive-training mining op:
    * for every query row, the k most-similar store rows whose label
    * DISAGREES (`sameLabel = false`: hard negatives — the lookalikes from
    * other classes a contrastive loss learns the most from) or AGREES
    * (`sameLabel = true`: hard positives, the anchor itself excluded by id).
    *
    * Output: (queryIdCol, id, similarity_score, distance, rank), rank 1..k
    * per query in score-desc id-asc order — [[batchTopK]]'s exact shape.
    *
    * Scale shape, identical to [[batchTopK]]: the query set (with labels)
    * broadcasts, the label predicate filters INSIDE the codegen'd scan
    * stage (no candidate ever materializes past it), and the bounded
    * [[TopKAggregator]] partial-aggregates so only M*k rows cross the one
    * shuffle. Mining over a labeled 100 TB corpus is exactly one scan.
    */
  def labelConstrainedTopK(
      queries: DataFrame,
      store: DataFrame,
      k: Int,
      sameLabel: Boolean,
      metric: String = vector.MetricCosine,
      vecCol: String = "vector",
      idCol: String = "id",
      labelCol: String = "label",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      queryLabelCol: String = "query_label"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pred =
      if (sameLabel) col(labelCol) === col(queryLabelCol) && col(idCol) =!= col(queryIdCol)
      else col(labelCol) =!= col(queryLabelCol)
    batchTopK(
      queries.select(col(queryIdCol), col(queryVecCol), col(queryLabelCol)),
      store, k, metric, vecCol, idCol, queryIdCol, queryVecCol,
      pairPredicate = Some(pred))
  }

  /** Nearest-centroid assignment: each row of `df` labeled with the id of
    * its best-scoring centroid — the primitive under cluster-balanced
    * sampling, cluster profiling, and coarse IVF-style routing when the
    * centroid set is an explicit DataFrame rather than a trained index.
    * Ties break on centroid id ascending (the [[TopKAggregator]] order, ==
    * the SQL `ORDER BY score DESC, id ASC` replay).
    *
    * Output: (id, centroid_id, score DOUBLE) — exactly one row per input
    * row.
    *
    * Scale shape: centroids broadcast (a centroid table is small by
    * construction — fail loudly upstream if it isn't), scoring happens in
    * the codegen'd scan stage, and the bounded top-1 aggregator
    * partial-aggregates, so the one shuffle carries one slim row per input
    * row.
    */
  def assignNearestCentroid(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      centIdCol: String,
      centVecCol: String,
      metric: String = vector.MetricCosine): DataFrame = {
    require(!centroids.isEmpty,
      "assignNearestCentroid: the centroid table is empty — every row " +
        "would silently vanish from the 'one row per input' contract")
    val top1 = udaf(new TopKAggregator(1, ascending = false))
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("_v"))
      .crossJoin(broadcast(centroids.select(
        col(centIdCol).cast("long").as("_cid"), col(centVecCol).as("_cv"))))
      .select(col("id"), col("_cid"),
        vector.similarity(col("_v"), col("_cv"), metric).as("_score"))
      .groupBy(col("id"))
      .agg(top1(col("_score"), col("_cid")).as("best"))
      .select(col("id"), col("best").getItem(0).getField("id").as("centroid_id"),
        col("best").getItem(0).getField("score").as("score"))
  }

  /** Margin-based candidate scoring (the published bitext-mining /
    * retrieval-calibration rule: Artetxe & Schwenk's ratio margin): each
    * forward candidate's similarity is renormalized by the neighborhood
    * density of BOTH endpoints —
    * `margin(x,y) = cos(x,y) / (0.5 * (avgK(x) + avgK(y)))` with `avgK(x)`
    * the mean similarity of x's k nearest store rows and `avgK(y)` the
    * mean similarity of y's k nearest QUERY rows. A raw-cosine top-1 keeps
    * hub vectors that are close to everything; the margin keeps pairs that
    * are close to each other RELATIVE to their neighborhoods — the
    * difference between 50% and 90%+ precision in published parallel-corpus
    * mining.
    *
    * Output: (query_id, id, cos, margin, rnk BIGINT) — the k forward
    * candidates per query re-ranked by margin desc / id asc. Both sides
    * must have at least k rows (an under-full neighborhood would make the
    * fixed-order denominator NULL — require it upstream). Every double is
    * engine-reproducible: cosines via the shared kernel, the averages as a
    * FIXED-association pivot sum `((c1+c2)+...)/k`, the margin as one
    * division — no libm call anywhere.
    *
    * Scale shape: one forward [[batchTopK]] (query set broadcast, bounded
    * aggregator), one reverse pass restricted to the DISTINCT candidate
    * rows (semi-join; again query-set broadcast + bounded aggregator), two
    * slim denominator joins, and a final window over <= k rows per query —
    * bounded by construction, never a hot key.
    */
  def marginTopK(
      queries: DataFrame,
      store: DataFrame,
      k: Int,
      metric: String = vector.MetricCosine,
      vecCol: String = "vector",
      idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the documented precondition, ENFORCED: an under-full neighborhood
    // (either side < k rows) leaves rank-k pivot columns NULL, so every
    // margin goes NULL and row_number ranks garbage silently. limit(k+…)
    // makes each check an early-exit scan, not a full count, so the guard
    // is O(k) even over a 100 TB store.
    require(queries.limit(k).count() >= k,
      s"marginTopK: queries has fewer than k=$k rows — avgK(y) over the " +
        "query neighborhood would be undefined (NULL margins)")
    require(store.limit(k).count() >= k,
      s"marginTopK: store has fewer than k=$k rows — avgK(x) over the " +
        "store neighborhood would be undefined (NULL margins)")
    val fwd = batchTopK(queries, store, k, metric, vecCol, idCol,
        queryIdCol, queryVecCol)
      .select(col(queryIdCol), col(idCol),
        col("similarity_score").as("cos"), col("rank"))
    // fixed-association mean of the rank-1..k similarities: pivot each rank
    // into its own column, then ((c1 + c2) + ...) / k — both engines
    // evaluate the identical IEEE expression tree
    def meanTopK(df: DataFrame, keyCol: String, out: String): DataFrame = {
      val pivots = (1 to k).map(i =>
        max(when(col("rank") === i, col("cos"))).as(s"_c$i"))
      val summed = (1 to k).map(i => col(s"_c$i")).reduce(_ + _)
      df.groupBy(col(keyCol)).agg(pivots.head, pivots.tail: _*)
        .select(col(keyCol), (summed / lit(k.toDouble)).as(out))
    }
    val dx = meanTopK(fwd, queryIdCol, "_dx")
    val candRows = store.join(
      fwd.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
    val topkRev = udaf(new TopKAggregator(k, ascending = false))
    val rev = candRows
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
      .select(col(idCol),
        vector.similarity(col(vecCol), col(queryVecCol), metric).as("_s"),
        col(queryIdCol).cast("long").as("_qid"))
      .groupBy(col(idCol))
      .agg(topkRev(col("_s"), col("_qid")).as("topk"))
      .select(col(idCol), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col(idCol), col("hit.score").as("cos"),
        (col("pos") + 1).cast("long").as("rank"))
    val dy = meanTopK(rev, idCol, "_dy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("margin").desc, col(idCol).asc)
    fwd.join(dx, Seq(queryIdCol)).join(dy, Seq(idCol))
      .withColumn("margin", col("cos") / (lit(0.5) * (col("_dx") + col("_dy"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col(queryIdCol), col(idCol), col("cos"), col("margin"), col("rnk"))
  }

  /** Batch kNN via window ranking — same result as [[batchTopK]] but expressed
    * with built-in window functions only, so it has a 1:1 ANSI SQL equivalent
    * for the DuckDB oracle. Shuffles all M*N scored rows; prefer
    * [[batchTopK]] beyond toy scale.
    */
  def batchTopKWindow(
      queries: DataFrame,
      store: DataFrame,
      k: Int,
      metric: String = vector.MetricCosine,
      vecCol: String = "vector",
      idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val w = Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("similarity_score").desc, col(idCol).asc)
    store
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
      .select(
        col(queryIdCol),
        col(idCol),
        vector.similarity(col(vecCol), col(queryVecCol), metric).as("similarity_score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("distance", vector.distanceFromSimilarity(col("similarity_score"), metric))
      .select(col(queryIdCol), col(idCol), col("similarity_score"), col("distance"), col("rank"))
  }

  /** Batch kNN via per-partition blocked scoring — the high-throughput path
    * (SURVEY.md §4 "batch matmul" analog: the reference computes one
    * [M,D]x[D,N] product, performance/mlx_optimized.py:59-88; here each
    * partition runs a BLAS dgemm of its row blocks against the broadcast
    * query block).
    *
    * Why it beats the expression path for M queries:
    *  - each store row is decoded and its norm computed ONCE, not once per
    *    query (the broadcast-join form re-evaluates the kernel M times/row);
    *  - dot/cosine scores come from one [block,D]x[D,M] dgemm per row block
    *    (dev.ludovic.netlib, the BLAS Spark ML itself uses), so the kernel
    *    is the same matmul shape the reference's batch path runs;
    *  - each partition emits at most M*k candidate rows, merged with one
    *    tiny final aggregation — shuffle width M*k*partitions.
    *
    * Same ranking semantics as [[batchTopK]] (ties broken by ascending id);
    * euclidean keeps the element-order scalar loop (its canonical form is
    * not a plain inner product).
    *
    * The query set is collected to the driver and broadcast (that is what
    * makes the dgemm shape possible), so it must be BOUNDED: at most
    * `maxQueries` rows. The guard reads maxQueries + 1 rows, never the whole
    * DataFrame, so an accidentally-unbounded query set fails fast without
    * materializing on the driver. For query sets beyond the cap use
    * [[batchTopK]] (fully distributed, no driver collect) or slice the
    * queries into capped passes.
    */
  def batchTopKBlocked(
      queries: DataFrame,
      store: DataFrame,
      k: Int,
      metric: String = vector.MetricCosine,
      vecCol: String = "vector",
      idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      maxQueries: Int = DefaultMaxBlockedQueries): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._
    require(Seq(vector.MetricCosine, vector.MetricEuclidean, vector.MetricDot)
      .contains(metric), s"unsupported metric $metric")
    require(maxQueries >= 1, s"maxQueries must be >= 1, got $maxQueries")

    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      // long-add before clamping: maxQueries = Int.MaxValue must not wrap to
      // a negative limit (AnalysisException) — it degrades to a plain cap
      .limit(math.min(maxQueries.toLong + 1, Int.MaxValue.toLong).toInt)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    require(qRows.nonEmpty, "empty query set")
    require(qRows.length <= maxQueries,
      s"batchTopKBlocked broadcasts the query set (driver-collected): got more " +
        s"than $maxQueries query rows. Raise maxQueries deliberately, run " +
        s"capped slices, or use batchTopK for unbounded query sets.")
    val qIds = qRows.map(_._1)
    val qVecs = qRows.map(_._2)
    val qNorms = qVecs.map(v => math.max(math.sqrt(v.map(x => x * x).sum), 1e-8))
    val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms))
    val isCos = metric == vector.MetricCosine
    val isEuc = metric == vector.MetricEuclidean

    val partialTopk: Dataset[(Long, Long, Double)] = store
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val (ids, vecs, norms) = bc.value
        val m = ids.length
        val dim = vecs.head.length
        // per-query bounded worst-first heaps of (score, id)
        val heaps = Array.fill(m)(new java.util.PriorityQueue[(Double, Long)](
          k + 1,
          (a: (Double, Long), b: (Double, Long)) =>
            if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
            else java.lang.Long.compare(b._2, a._2)))

        def push(qi: Int, score: Double, rowId: Long): Unit = {
          val h = heaps(qi)
          if (h.size < k) h.add((score, rowId))
          else {
            val worst = h.peek()
            if (score > worst._1 || (score == worst._1 && rowId < worst._2)) {
              h.poll(); h.add((score, rowId))
            }
          }
        }

        // element-order scalar scoring: euclidean always (its canonical form
        // is not an inner product), and any row whose width differs from the
        // query dim (defensive — stores are single-width by validation)
        def scoreScalar(rowId: Long, rv: Array[Double], rowNorm: Double): Unit = {
          var qi = 0
          while (qi < m) {
            val qv = vecs(qi)
            val n = math.min(rv.length, qv.length)
            var acc = 0.0
            var j = 0
            if (isEuc) {
              while (j < n) { val t = rv(j) - qv(j); acc += t * t; j += 1 }
              acc = 1.0 / (1.0 + math.sqrt(acc)) // canonical similarity form
            } else {
              while (j < n) { acc += rv(j) * qv(j); j += 1 }
              if (isCos) acc = acc / (rowNorm * norms(qi))
            }
            push(qi, acc, rowId)
            qi += 1
          }
        }

        if (isEuc) {
          iter.foreach { case (rowId, fv) =>
            val rv = new Array[Double](fv.length)
            var i = 0
            while (i < fv.length) { rv(i) = fv(i); i += 1 }
            scoreScalar(rowId, rv, 1.0)
          }
        } else {
          // dot/cosine: dgemm row blocks against the query matrix.
          // Row-major [B,D] block == column-major DxB => C = A^T * Q is
          // column-major BxM with C(bi, qi) at c(qi*B + bi).
          val blas = dev.ludovic.netlib.blas.BLAS.getInstance()
          val qMat = new Array[Double](m * dim) // column-major DxM
          var qi = 0
          while (qi < m) {
            val qv = vecs(qi)
            var j = 0
            while (j < dim && j < qv.length) { qMat(qi * dim + j) = qv(j); j += 1 }
            qi += 1
          }
          val B = 512
          val blockIds = new Array[Long](B)
          val blockNorms = new Array[Double](B)
          val blockFlat = new Array[Double](B * dim)
          val scores = new Array[Double](B * m)
          var fill = 0

          def flush(): Unit = if (fill > 0) {
            blas.dgemm("T", "N", fill, m, dim, 1.0,
              blockFlat, dim, qMat, dim, 0.0, scores, fill)
            var q = 0
            while (q < m) {
              val qNorm = norms(q)
              val base = q * fill
              var bi = 0
              while (bi < fill) {
                val s = if (isCos) scores(base + bi) / (blockNorms(bi) * qNorm)
                        else scores(base + bi)
                push(q, s, blockIds(bi))
                bi += 1
              }
              q += 1
            }
            fill = 0
          }

          iter.foreach { case (rowId, fv) =>
            if (fv.length != dim) {
              // ragged row: score it exactly, outside the uniform block
              val rv = new Array[Double](fv.length)
              var i = 0
              var nr = 0.0
              while (i < fv.length) { rv(i) = fv(i); nr += rv(i) * rv(i); i += 1 }
              scoreScalar(rowId, rv, math.max(math.sqrt(nr), 1e-8))
            } else {
              val off = fill * dim
              var i = 0
              var nr = 0.0
              while (i < dim) {
                val x = fv(i).toDouble
                blockFlat(off + i) = x
                nr += x * x
                i += 1
              }
              blockIds(fill) = rowId
              blockNorms(fill) = math.max(math.sqrt(nr), 1e-8)
              fill += 1
              if (fill == B) flush()
            }
          }
          flush()
        }

        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          while (!h.isEmpty) { val (s, id) = h.poll(); out += ((ids(qi), id, s)) }
          out
        }
      }

    val topk = udaf(new TopKAggregator(k, ascending = false))
    partialTopk.toDF(queryIdCol, idCol, "similarity_score")
      .groupBy(col(queryIdCol))
      .agg(topk(col("similarity_score"), col(idCol)).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(
        col(queryIdCol),
        col("hit.id").as(idCol),
        col("hit.score").as("similarity_score"),
        vector.distanceFromSimilarity(col("hit.score"), metric).as("distance"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Similarity-threshold + greedy context-length cap (SURVEY.md §2.6 T3,
    * reference integrations/mlx_lm_pipeline.py:725-765): keep hits with
    * similarity >= minSimilarity, in rank order, while the running sum of
    * `lengthCol` stays within maxContextLength, then take at most k.
    */
  def retrieveContext(
      ranked: DataFrame,
      minSimilarity: Double,
      maxContextLength: Long,
      k: Int,
      lengthCol: String = "chunk_length",
      scoreCol: String = "similarity_score"): DataFrame = {
    val w = graft.functions.windows.boundedGlobal(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .filter(col(scoreCol) >= minSimilarity)
      .withColumn("_running_len", sum(col(lengthCol)).over(w))
      .filter(col("_running_len") <= maxContextLength)
      .drop("_running_len")
      .orderBy(col(scoreCol).desc)
      .limit(k)
  }
}

package graft.ml

import graft.functions.{vector, PqAdcScore, PqEncode}
import graft.operators.TopKAggregator
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the composition of the coarse inverted-file index ([[IvfIndex]])
  * with product-quantized codes ([[ProductQuantizer]]) — the canonical
  * billion-scale ANN layout (Jegou/Douze/Schmid, TPAMI 2011 §V; FAISS
  * `IndexIVFPQ` with `by_residual=false`).
  *
  * Why the composition matters at 100 TB, beyond either half alone:
  *  - the coarse quantizer prunes the SCAN — a search touches only the
  *    nProbe/nLists fraction of partitions some query probes;
  *  - PQ shrinks what the scanned partitions HOLD — the codes table is
  *    ~64x smaller than the float store (M=8 nibble-codes vs 64 float32),
  *    so the pruned scan reads megabytes where the raw store reads
  *    gigabytes, and scoring is an M-lookup table sum inside whole-stage
  *    codegen instead of a 64-dim float kernel;
  *  - raw vectors are touched only by the final candidate gather (the
  *    over-fetch x rerank discipline of [[Quantize.searchRerank]]), itself
  *    pruned to the probed partitions by joining on (list_id, id).
  *
  * Learned builds default to RESIDUAL encoding (FAISS `by_residual=true`,
  * the TPAMI 2011 §V.B form): codes quantize `v' − basis(list(v))` rather
  * than `v'`, where `v'` is the vector in METRIC-MATCHED code space (the
  * l2-normalized vector under cosine — on the unit sphere min-L2 ranks
  * exactly by cosine, so ADC distance tables and the truth metric agree).
  * The residual BASIS per list is the MEAN of the coded-space vectors
  * assigned to it — the variance-minimizing choice (E‖v'−μ‖² =
  * E‖v'‖² − ‖μ‖², never worse than raw coding). It is deliberately NOT
  * the assignment centroid: under cosine the assignment centroids are
  * re-normalized onto the unit sphere, and subtracting a unit vector from
  * weakly-clustered unit data INFLATES variance (E‖v̂−ĉ‖² = 2−2E[cos] can
  * exceed 1) — measured on the synthetic corpus, sphere-centroid residuals
  * cost ~0.09 recall@10 while mean-basis residuals are never worse.
  * Incremental [[append]] stays O(batch): appends assign against the
  * FROZEN coarse centroids and the persisted basis (the
  * [[IvfIndex.append]] contract), so a row's residual basis never moves
  * until an explicit rebuild — which retrains both quantizers anyway.
  * [[buildFixed]] keeps `by_residual=false` so the q52 oracle twin replays
  * codes and ADC ranks in plain SQL; its `residual=true` variant pins the
  * basis to the explicit centroids so q71 replays the residual pipeline.
  *
  * Reference analog: none (the reference serves float32 from RAM,
  * performance/hnsw_index.py) — this is the scale extension of that
  * serving path, like [[Quantize]] and [[ProductQuantizer]].
  */
object IvfPq {

  /** ADC tables are embedded in the scoring expression (driver-computed,
    * broadcast with the plan); residual search needs one M x K table per
    * (query, probed list) pair, so cap the total to keep the plan small.
    * 1<<22 doubles = 32 MiB — far above any sane batch (e.g. 4096 queries
    * x 8 probes x M=8 x K=16 = 4.2M entries sits exactly at the cap).
    */
  val MaxAdcTableEntries: Long = 1L << 22

  /** A built IVF-PQ index: coarse lists + codebooks + partitioned layouts.
    * `{path}/ivf/data/list_id=*`  — (id, vector) float store (rerank gather)
    * `{path}/codes/list_id=*`     — (id, codes) PQ codes (ADC scan)
    * `resBase` — per-list residual bases; defined iff `by_residual=true`
    * (see object doc for why the basis is the coded-space list MEAN).
    */
  case class Index(ivf: IvfIndex, model: ProductQuantizer.PqModel, path: String,
      resBase: Option[Array[Array[Double]]] = None) {
    def residual: Boolean = resBase.isDefined
    def codesPath: String = s"$path/codes"
    def spark: SparkSession = ivf.spark
  }

  /** The coded-space vector, as a Column: the raw vector when no basis is
    * given (`by_residual=false`); otherwise the residual `v' − basis(list)`
    * with `v'` l2-normalized under cosine (metric-matched code space) and
    * the basis read from a broadcast literal.
    */
  private def codedVec(ivf: IvfIndex, vecCol: org.apache.spark.sql.Column,
      listCol: org.apache.spark.sql.Column,
      resBase: Option[Array[Array[Double]]]): org.apache.spark.sql.Column =
    resBase match {
      case None => vecCol
      case Some(basis) =>
        val v =
          if (ivf.metric == vector.MetricCosine) vector.l2_normalize(vecCol)
          else vecCol.cast("array<double>")
        val bases = typedLit(basis.map(_.toSeq).toSeq)
        zip_with(v, element_at(bases, listCol + 1), (a, b) => a - b)
    }

  /** Per-list residual bases for a learned build: the elementwise MEAN of
    * the coded-space vectors assigned to each list (one slim
    * (list, pos, mean) aggregation — nLists x dim values to the driver).
    * Empty lists fall back to the assignment centroid so every basis is
    * defined.
    */
  private def listMeans(
      df: DataFrame, idCol: String, vecCol: String, ivf: IvfIndex): Array[Array[Double]] = {
    val coded = df
      .select(col(vecCol).as("_v"),
        ivf.probes(col(vecCol), 1).getItem(0).as("_list"))
      .select(col("_list"),
        (if (ivf.metric == vector.MetricCosine) vector.l2_normalize(col("_v"))
         else col("_v").cast("array<double>")).as("_cv"))
    val rows = coded
      .select(col("_list"), posexplode(col("_cv")).as(Seq("_pos", "_x")))
      .groupBy(col("_list"), col("_pos")).agg(avg(col("_x")).as("_m"))
      .collect()
    val dim = ivf.centroids.head.length
    val out = Array.tabulate(ivf.centroids.length)(l => ivf.centroids(l).clone())
    val seen = Array.fill(ivf.centroids.length)(false)
    rows.foreach { r =>
      val l = r.getInt(0)
      if (!seen(l)) { out(l) = new Array[Double](dim); seen(l) = true }
      out(l)(r.getInt(1)) = r.getDouble(2)
    }
    out
  }

  /** Distributed build: k-means coarse quantizer + per-subspace k-means
    * codebooks, one assignment/encode pass, both layouts partitioned by
    * list_id. `residual=true` (default) trains the codebooks on
    * metric-matched residuals against per-list mean bases (see the object
    * doc for why this lifts recall at identical storage cost).
    */
  def build(
      df: DataFrame, idCol: String, vecCol: String, path: String,
      nLists: Int = 64, numSubspaces: Int = 8, codebookSize: Int = 16,
      metric: String = vector.MetricCosine,
      maxIter: Int = 10, seed: Long = 42L, residual: Boolean = true): Index = {
    val ivf = IvfIndex.build(df, idCol, vecCol, s"$path/ivf", nLists, metric,
      maxIter, seed)
    val resBase =
      if (!residual) None
      else Some(listMeans(df, idCol, vecCol, ivf))
    val trainDf =
      if (!residual) df.select(col(idCol).cast("long").as("id"), col(vecCol).as("_cv"))
      else df
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("_v"),
          ivf.probes(col(vecCol), 1).getItem(0).as("_list"))
        .select(col("id"),
          codedVec(ivf, col("_v"), col("_list"), resBase).as("_cv"))
    val model = ProductQuantizer.train(trainDf, "id", "_cv", numSubspaces,
      codebookSize, maxIter = maxIter, seed = seed)
    writeCodes(df, idCol, vecCol, ivf, model, path, resBase)
  }

  /** Deterministic twin: explicit coarse centroids + fixed row-sampled
    * codebooks, so an external engine can replay assignment, codes, probe
    * order and ADC ranks exactly (the q46/q51 oracle trick composed — q52).
    * Defaults to `by_residual=false` (q52's plain-SQL code replay);
    * `residual=true` quantizes fixed-row RESIDUALS instead — still fully
    * deterministic (assignment is an argmin over explicit centroids), so
    * the oracle replays the residual pipeline end to end too (q71).
    */
  def buildFixed(
      df: DataFrame, idCol: String, vecCol: String, path: String,
      centroids: Array[Array[Double]], numSubspaces: Int, codebookSize: Int,
      metric: String = vector.MetricEuclidean, residual: Boolean = false): Index = {
    val ivf = IvfIndex.buildWithCentroids(df, idCol, vecCol, s"$path/ivf",
      centroids, metric)
    // the fixed twin PINS the basis to the assignment centroids (not list
    // means) so the oracle can replay residuals without re-deriving means
    val resBase = if (residual) Some(ivf.centroids) else None
    val modelDf =
      if (!residual) df.select(col(idCol).cast("long").as("id"), col(vecCol).as("_cv"))
      else df
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("_v"),
          ivf.probes(col(vecCol), 1).getItem(0).as("_list"))
        .select(col("id"),
          codedVec(ivf, col("_v"), col("_list"), resBase).as("_cv"))
    val model = ProductQuantizer.fixedModel(modelDf, "id", "_cv", numSubspaces,
      codebookSize)
    writeCodes(df, idCol, vecCol, ivf, model, path, resBase)
  }

  /** One encode pass: (id, codes, list_id), codes over the coded space. */
  private def encodeRows(
      df: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex, model: ProductQuantizer.PqModel,
      resBase: Option[Array[Array[Double]]]): DataFrame =
    df.select(
        col(idCol).cast("long").as("id"), col(vecCol).as("_v"),
        ivf.probes(col(vecCol), 1).getItem(0).as("list_id"))
      .select(col("id"),
        Bridge.column(PqEncode(
          Bridge.expression(codedVec(ivf, col("_v"), col("list_id"), resBase)),
          model.flat, model.numSubspaces, model.codebookSize,
          model.subDim)).as("codes"),
        col("list_id"))

  private def writeCodes(
      df: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex, model: ProductQuantizer.PqModel, path: String,
      resBase: Option[Array[Array[Double]]]): Index = {
    encodeRows(df, idCol, vecCol, ivf, model, resBase)
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/codes")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((model.numSubspaces, model.codebookSize, model.subDim,
        model.flat.toSeq, resBase.map(_.map(_.toSeq).toSeq)))
      .toDF("num_subspaces", "codebook_size", "sub_dim", "flat", "res_base")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pqmodel")
    Index(ivf, model, path, resBase)
  }

  /** Load a previously built index (codebooks are persisted at build) under
    * the metric PERSISTED in the coarse half's buildmeta — an index built
    * euclidean and reloaded bare no longer silently probes and re-ranks
    * under cosine (the metric is index state, like [[IvfIndex.load]]).
    */
  def load(spark: SparkSession, path: String): Index = {
    val (model, resBase) = readModel(spark, path)
    Index(IvfIndex.load(spark, s"$path/ivf"), model, path, resBase)
  }

  /** Load with an explicit metric: validated against the persisted one
    * (mismatch throws); for pre-metric-persistence indexes it is trusted.
    */
  def load(spark: SparkSession, path: String, metric: String): Index = {
    val (model, resBase) = readModel(spark, path)
    Index(IvfIndex.load(spark, s"$path/ivf", metric), model, path, resBase)
  }

  /** Reads (model, resBase); pre-residual layouts (no `res_base` column)
    * load as `by_residual=false` — exactly how they were encoded.
    */
  private def readModel(
      spark: SparkSession, path: String): (ProductQuantizer.PqModel, Option[Array[Array[Double]]]) = {
    val df = spark.read.parquet(s"$path/pqmodel")
    val hasBase = df.schema.fieldNames.contains("res_base")
    val row = df
      .select(col("num_subspaces"), col("codebook_size"), col("sub_dim"),
        col("flat"),
        (if (hasBase) col("res_base")
         else lit(null).cast("array<array<double>>")).as("res_base"))
      .collect().head
    val resBase =
      if (row.isNullAt(4)) None
      else Some(row.getSeq[scala.collection.Seq[Double]](4).map(_.toArray).toArray)
    (ProductQuantizer.PqModel(row.getInt(0), row.getInt(1),
      row.getInt(2), row.getSeq[Double](3).toArray), resBase)
  }

  /** Incremental maintenance, O(batch) like [[IvfIndex.append]]: the new
    * rows are assigned + appended to the float store AND encoded + appended
    * to the codes table against the FROZEN codebooks AND frozen coarse
    * centroids — freezing both makes residual coding append-sound (a row's
    * residual basis `c(list)` never moves between rebuilds). Monitor
    * [[IvfIndex.maintenance]] on the coarse half; a rebuild retrains both
    * quantizers.
    */
  def append(index: Index, rows: DataFrame,
      idCol: String = "id", vecCol: String = "vector"): Long = {
    val n = index.ivf.append(rows, idCol, vecCol)
    encodeRows(rows, idCol, vecCol, index.ivf, index.model, index.resBase)
      .write.mode("append").partitionBy("list_id").parquet(index.codesPath)
    n
  }

  /** Batch ADC search over the probed lists only. Queries are driver-
    * collected and capped (the blocked-kNN discipline); their probe lists
    * and ADC distance tables are computed driver-side (nQueries x nLists
    * scores plus one M x K table per query — per (query, probed list) for
    * residual indexes, capped by [[MaxAdcTableEntries]]), and the codes
    * scan is FILTERED to the union of probed lists, so partition pruning
    * keeps the unprobed
    * majority of the store untouched. The probed (t_idx, query_id, list_id)
    * set is broadcast; each scanned partition scores only against the
    * queries that probe it; the per-query top-k is a partial-aggregating
    * [[TopKAggregator]], so the shuffle moves <= nQueries*k rows.
    *
    * Output: (query_id, id, rank, adc) — ranks by (adc asc, id asc).
    */
  /** The driver-side half of a batch search: queries collected ONCE behind
    * the fail-fast cap (user lineage never re-runs), ADC tables and probe
    * lists computed in memory. `probeTriples._1` is the TABLE index the
    * scoring expression looks up: the query index for `by_residual=false`
    * (one M x K table per query), the triple ordinal for residual indexes
    * (one table per (query, probed list) — the table quantizes
    * `q' − c(list)`, matching the residual the codes quantize). Either way
    * the tables stay driver-side KBs-to-MBs, capped by
    * [[MaxAdcTableEntries]].
    */
  private case class ProbedQueries(
      qIds: Array[Long], qVecs: Array[Array[Double]],
      probeTriples: Seq[(Int, Long, Int)], tables: Array[Double]) {
    def probedLists: Seq[Int] = probeTriples.map(_._3).distinct
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var j = 0
    while (j < v.length) { s += v(j) * v(j); j += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def probeQueries(
      index: Index, queries: DataFrame, nProbe: Int,
      queryIdCol: String, queryVecCol: String, maxQueries: Int): ProbedQueries = {
    val model = index.model
    val probeLimit = math.min(maxQueries.toLong + 1, Int.MaxValue.toLong).toInt
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      .limit(probeLimit).collect()
    require(qRows.length <= maxQueries,
      s"query set exceeds maxQueries=$maxQueries; batch it or raise the cap")
    require(qRows.nonEmpty, "empty query set")
    val sorted = qRows.sortBy(_.getLong(0))
    val qIds = sorted.map(_.getLong(0))
    val qVecs = sorted.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray)
    qVecs.foreach(v => require(v.length == model.dim,
      s"query dim ${v.length} != model dim ${model.dim}"))
    val rawTriples = qIds.indices.flatMap { qi =>
      index.ivf.probeIdsFor(qVecs(qi).toSeq, nProbe).map(l => (qi, qIds(qi), l))
    }
    if (!index.residual) {
      ProbedQueries(qIds, qVecs, rawTriples,
        ProductQuantizer.adcTables(model, qVecs))
    } else {
      require(rawTriples.length.toLong * model.numSubspaces * model.codebookSize
          <= MaxAdcTableEntries,
        s"residual ADC tables for ${rawTriples.length} (query, probe) pairs " +
          s"exceed MaxAdcTableEntries=$MaxAdcTableEntries; " +
          "batch the queries or lower nProbe")
      val coded =
        if (index.ivf.metric == vector.MetricCosine) qVecs.map(normalized)
        else qVecs
      val bases = index.resBase.get
      val triVecs = rawTriples.map { case (qi, _, l) =>
        val q = coded(qi)
        val c = bases(l)
        Array.tabulate(q.length)(j => q(j) - c(j))
      }.toArray
      val triples = rawTriples.zipWithIndex.map { case ((_, qid, l), t) =>
        (t, qid, l)
      }
      ProbedQueries(qIds, qVecs, triples,
        ProductQuantizer.adcTables(model, triVecs))
    }
  }

  /** Pruned ADC top-k over an already-probed query set. `t_idx` selects the
    * scoring table (per-query, or per-(query, list) for residual indexes —
    * the list_id equi-join guarantees each code row scores against the
    * table built for ITS list's residual basis).
    */
  private def adcTopK(index: Index, pq: ProbedQueries, k: Int): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val model = index.model
    val probed = pq.probeTriples.toDF("t_idx", "query_id", "list_id")
    val store = spark.read.parquet(index.codesPath)
      .filter(col("list_id").isin(pq.probedLists: _*))
    val topk = udaf(new TopKAggregator(k, ascending = true))
    store.join(broadcast(probed), Seq("list_id"))
      .select(col("query_id"), col("id"),
        Bridge.column(PqAdcScore(
          Bridge.expression(col("codes")), Bridge.expression(col("t_idx")),
          pq.tables, model.numSubspaces, model.codebookSize)).as("adc"))
      .groupBy(col("query_id"))
      .agg(topk(col("adc"), col("id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("hit.score").as("adc"))
  }

  def searchBatchAdc(
      index: Index, queries: DataFrame, k: Int, nProbe: Int = 8,
      queryIdCol: String = "query_id", queryVecCol: String = "query_vec",
      maxQueries: Int = graft.operators.Knn.DefaultMaxBlockedQueries): DataFrame =
    adcTopK(index,
      probeQueries(index, queries, nProbe, queryIdCol, queryVecCol, maxQueries), k)

  /** Two-phase batch search: pruned ADC over-fetch, then exact re-rank of
    * the candidates under the index metric. The float gather scans ONLY the
    * probed partitions (candidates live in probed lists by construction),
    * and the re-rank queries are rebuilt from the one driver collect — the
    * caller's lineage runs exactly once. Exactness: the collected query
    * vectors are exact float->double widenings, so re-rank scores are
    * bit-identical to scoring against the original column.
    * Output: (query_id, id, rank, score) — score is the exact similarity.
    */
  def searchRerankBatch(
      index: Index, queries: DataFrame, k: Int, nProbe: Int = 8,
      overFetch: Int = 4,
      queryIdCol: String = "query_id", queryVecCol: String = "query_vec",
      maxQueries: Int = graft.operators.Knn.DefaultMaxBlockedQueries): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val pq = probeQueries(index, queries, nProbe, queryIdCol, queryVecCol,
      maxQueries)
    val cand = adcTopK(index, pq, k * overFetch)
      .select(col("query_id"), col("id"))
    val vecs = spark.read.parquet(s"${index.path}/ivf/data")
      .filter(col("list_id").isin(pq.probedLists: _*))
      .select(col("id"), col("vector"))
    val queryDf = pq.qIds.zip(pq.qVecs.map(_.toSeq)).toSeq
      .toDF("query_id", "_qv")
    val exact = cand
      .join(vecs, Seq("id"))
      .join(broadcast(queryDf), Seq("query_id"))
      .select(col("query_id"), col("id"),
        vector.similarity(col("vector"), col("_qv"), index.ivf.metric).as("score"))
    val topk = udaf(new TopKAggregator(k, ascending = false))
    exact
      .groupBy(col("query_id"))
      .agg(topk(col("score"), col("id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("hit.score").as("score"))
  }
}

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
  * Codes are encoded against GLOBAL codebooks (not per-list residuals):
  * residual coding couples every code to its list assignment, which would
  * force re-encoding on [[IvfIndex.append]]-style incremental maintenance;
  * global codebooks keep append O(batch) — assign + encode + append — at a
  * modest recall cost the exact re-rank recovers.
  *
  * Reference analog: none (the reference serves float32 from RAM,
  * performance/hnsw_index.py) — this is the scale extension of that
  * serving path, like [[Quantize]] and [[ProductQuantizer]].
  */
object IvfPq {

  /** A built IVF-PQ index: coarse lists + codebooks + partitioned layouts.
    * `{path}/ivf/data/list_id=*`  — (id, vector) float store (rerank gather)
    * `{path}/codes/list_id=*`     — (id, codes) PQ codes (ADC scan)
    */
  case class Index(ivf: IvfIndex, model: ProductQuantizer.PqModel, path: String) {
    def codesPath: String = s"$path/codes"
    def spark: SparkSession = ivf.spark
  }

  /** Distributed build: k-means coarse quantizer + per-subspace k-means
    * codebooks, one assignment/encode pass, both layouts partitioned by
    * list_id.
    */
  def build(
      df: DataFrame, idCol: String, vecCol: String, path: String,
      nLists: Int = 64, numSubspaces: Int = 8, codebookSize: Int = 16,
      metric: String = vector.MetricCosine,
      maxIter: Int = 10, seed: Long = 42L): Index = {
    val ivf = IvfIndex.build(df, idCol, vecCol, s"$path/ivf", nLists, metric,
      maxIter, seed)
    val model = ProductQuantizer.train(df, idCol, vecCol, numSubspaces,
      codebookSize, maxIter = maxIter, seed = seed)
    writeCodes(df, idCol, vecCol, ivf, model, path)
  }

  /** Deterministic twin: explicit coarse centroids + fixed row-sampled
    * codebooks, so an external engine can replay assignment, codes, probe
    * order and ADC ranks exactly (the q46/q51 oracle trick composed — q52).
    */
  def buildFixed(
      df: DataFrame, idCol: String, vecCol: String, path: String,
      centroids: Array[Array[Double]], numSubspaces: Int, codebookSize: Int,
      metric: String = vector.MetricEuclidean): Index = {
    val ivf = IvfIndex.buildWithCentroids(df, idCol, vecCol, s"$path/ivf",
      centroids, metric)
    val model = ProductQuantizer.fixedModel(df, idCol, vecCol, numSubspaces,
      codebookSize)
    writeCodes(df, idCol, vecCol, ivf, model, path)
  }

  private def writeCodes(
      df: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex, model: ProductQuantizer.PqModel, path: String): Index = {
    df.select(
        col(idCol).cast("long").as("id"),
        Bridge.column(PqEncode(Bridge.expression(col(vecCol)), model.flat,
          model.numSubspaces, model.codebookSize, model.subDim)).as("codes"),
        ivf.probes(col(vecCol), 1).getItem(0).as("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$path/codes")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((model.numSubspaces, model.codebookSize, model.subDim, model.flat.toSeq))
      .toDF("num_subspaces", "codebook_size", "sub_dim", "flat")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pqmodel")
    Index(ivf, model, path)
  }

  /** Load a previously built index (codebooks are persisted at build) under
    * the metric PERSISTED in the coarse half's buildmeta — an index built
    * euclidean and reloaded bare no longer silently probes and re-ranks
    * under cosine (the metric is index state, like [[IvfIndex.load]]).
    */
  def load(spark: SparkSession, path: String): Index = {
    val model = readModel(spark, path)
    Index(IvfIndex.load(spark, s"$path/ivf"), model, path)
  }

  /** Load with an explicit metric: validated against the persisted one
    * (mismatch throws); for pre-metric-persistence indexes it is trusted.
    */
  def load(spark: SparkSession, path: String, metric: String): Index = {
    val model = readModel(spark, path)
    Index(IvfIndex.load(spark, s"$path/ivf", metric), model, path)
  }

  private def readModel(spark: SparkSession, path: String): ProductQuantizer.PqModel = {
    val row = spark.read.parquet(s"$path/pqmodel")
      .select(col("num_subspaces"), col("codebook_size"), col("sub_dim"), col("flat"))
      .collect().head
    ProductQuantizer.PqModel(row.getInt(0), row.getInt(1),
      row.getInt(2), row.getSeq[Double](3).toArray)
  }

  /** Incremental maintenance, O(batch) like [[IvfIndex.append]]: the new
    * rows are assigned + appended to the float store AND encoded + appended
    * to the codes table against the FROZEN codebooks (global codebooks make
    * this sound — per-list residual coding would force re-encoding on every
    * centroid drift). Monitor [[IvfIndex.maintenance]] on the coarse half;
    * a rebuild retrains both quantizers.
    */
  def append(index: Index, rows: DataFrame,
      idCol: String = "id", vecCol: String = "vector"): Long = {
    val n = index.ivf.append(rows, idCol, vecCol)
    val model = index.model
    rows.select(
        col(idCol).cast("long").as("id"),
        Bridge.column(PqEncode(Bridge.expression(col(vecCol)), model.flat,
          model.numSubspaces, model.codebookSize, model.subDim)).as("codes"),
        index.ivf.probes(col(vecCol), 1).getItem(0).as("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(index.codesPath)
    n
  }

  /** Batch ADC search over the probed lists only. Queries are driver-
    * collected and capped (the blocked-kNN discipline); their probe lists
    * and ADC distance tables are computed driver-side (nQueries x nLists
    * and nQueries x M x K doubles — KBs), and the codes scan is FILTERED to
    * the union of probed lists, so partition pruning keeps the unprobed
    * majority of the store untouched. The probed (q_idx, query_id, list_id)
    * set is broadcast; each scanned partition scores only against the
    * queries that probe it; the per-query top-k is a partial-aggregating
    * [[TopKAggregator]], so the shuffle moves <= nQueries*k rows.
    *
    * Output: (query_id, id, rank, adc) — ranks by (adc asc, id asc).
    */
  /** The driver-side half of a batch search: queries collected ONCE behind
    * the fail-fast cap (user lineage never re-runs), ADC tables and probe
    * lists computed in memory (nQueries x M x K and nQueries x nProbe —
    * KBs).
    */
  private case class ProbedQueries(
      qIds: Array[Long], qVecs: Array[Array[Double]],
      probeTriples: Seq[(Int, Long, Int)], tables: Array[Double]) {
    def probedLists: Seq[Int] = probeTriples.map(_._3).distinct
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
    val probeTriples = qIds.indices.flatMap { qi =>
      index.ivf.probeIdsFor(qVecs(qi).toSeq, nProbe).map(l => (qi, qIds(qi), l))
    }
    ProbedQueries(qIds, qVecs, probeTriples,
      ProductQuantizer.adcTables(model, qVecs))
  }

  /** Pruned ADC top-k over an already-probed query set. */
  private def adcTopK(index: Index, pq: ProbedQueries, k: Int): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val model = index.model
    val probed = pq.probeTriples.toDF("q_idx", "query_id", "list_id")
    val store = spark.read.parquet(index.codesPath)
      .filter(col("list_id").isin(pq.probedLists: _*))
    val topk = udaf(new TopKAggregator(k, ascending = true))
    store.join(broadcast(probed), Seq("list_id"))
      .select(col("query_id"), col("id"),
        Bridge.column(PqAdcScore(
          Bridge.expression(col("codes")), Bridge.expression(col("q_idx")),
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

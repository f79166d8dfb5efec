package graft.ml

import graft.functions.{PqAdcScore, PqEncode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

/** Product quantization — the compression tier between int8 scalar codes
  * ([[Quantize]], 4x) and the raw floats: vectors split into M subspaces,
  * each coded as its nearest codebook entry, so a 64-dim float32 vector
  * becomes M small integers (M=8, K=16 -> 8 nibbles; 64x smaller at rest).
  * Search runs ASYMMETRICALLY (ADC): the query stays exact, one M x K
  * distance-table lookup per coded row — no decompression, inside
  * whole-stage codegen ([[graft.functions.PqAdcScore]]).
  *
  * Scale shape: training samples a bounded set driver-side (standard PQ
  * practice — codebooks are KBs); encoding is one distributed scan; batch
  * ADC is one scan of the codes table times a driver-capped query set (the
  * blocked-kNN discipline of Knn.DefaultMaxBlockedQueries); re-rank gathers
  * full floats for only the over-fetched candidates (SURVEY §2.2 P2).
  *
  * Reference analog: none (the reference serves float32 from RAM) — scale
  * extension like [[Quantize]]; published algorithm (Jegou/Douze/Schmid,
  * TPAMI 2011, "Product quantization for nearest neighbor search").
  */
object ProductQuantizer {

  /** Codebooks flattened [m][k][j] row-major; dim = numSubspaces * subDim. */
  case class PqModel(
      numSubspaces: Int, codebookSize: Int, subDim: Int, flat: Array[Double]) {
    require(numSubspaces >= 1 && codebookSize >= 1 && subDim >= 1)
    require(flat.length == numSubspaces * codebookSize * subDim,
      s"flat length ${flat.length} != $numSubspaces*$codebookSize*$subDim")
    def dim: Int = numSubspaces * subDim
    def centroid(m: Int, k: Int): Array[Double] =
      java.util.Arrays.copyOfRange(flat, (m * codebookSize + k) * subDim,
        (m * codebookSize + k + 1) * subDim)
  }

  /** Deterministic FIXED codebooks: subspace slices of the `codebookSize`
    * lowest-id vectors, in id order — no iteration, so an external engine
    * can replay code assignment exactly (the q46 fixed-quantizer trick; the
    * oracle-checked twin of [[train]]).
    */
  def fixedModel(
      df: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int, codebookSize: Int): PqModel = {
    val rows = df.orderBy(col(idCol).cast("long").asc)
      .select(col(vecCol)).limit(codebookSize).collect()
    require(rows.length == codebookSize,
      s"need $codebookSize codebook rows, got ${rows.length}")
    val vecs = rows.map(_.getSeq[Any](0).map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray)
    val dim = vecs.head.length
    require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces")
    val subDim = dim / numSubspaces
    val flat = new Array[Double](numSubspaces * codebookSize * subDim)
    for (m <- 0 until numSubspaces; k <- 0 until codebookSize; j <- 0 until subDim)
      flat((m * codebookSize + k) * subDim + j) = vecs(k)(m * subDim + j)
    PqModel(numSubspaces, codebookSize, subDim, flat)
  }

  /** Production codebooks: per-subspace k-means (euclidean — PQ codes
    * squared-L2 residuals) on a bounded sample of lowest-id rows.
    */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int, codebookSize: Int,
      sampleSize: Int = 10000, maxIter: Int = 10, seed: Long = 42L): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sample = df.orderBy(col(idCol).cast("long").asc)
      .select(col(vecCol).as("v")).limit(sampleSize)
      .localCheckpoint(true) // M k-means fits re-read it
    val dimRow = sample.select(size(col("v"))).head()
    val dim = dimRow.getInt(0)
    require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces")
    val subDim = dim / numSubspaces
    val flat = new Array[Double](numSubspaces * codebookSize * subDim)
    for (m <- 0 until numSubspaces) {
      val features = sample.select(array_to_vector(
        slice(col("v"), m * subDim + 1, subDim).cast("array<double>")).as("features"))
      val model = new KMeans().setK(codebookSize).setMaxIter(maxIter)
        .setSeed(seed + m).setFeaturesCol("features").fit(features)
      val cents = model.clusterCenters.map(_.toArray)
      for (k <- cents.indices; j <- 0 until subDim)
        flat((m * codebookSize + k) * subDim + j) = cents(k)(j)
      // k-means may return < K clusters on degenerate data; leftover slots
      // stay zero vectors (never selected unless genuinely nearest)
    }
    PqModel(numSubspaces, codebookSize, subDim, flat)
  }

  /** One distributed encode pass: (id, codes array<int> of length M). */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      Bridge.column(PqEncode(Bridge.expression(col(vecCol)), model.flat,
        model.numSubspaces, model.codebookSize, model.subDim)).as("codes"))

  /** Per-query ADC distance tables, flattened [query][m][k] row-major. */
  private[ml] def adcTables(model: PqModel, queryVecs: Array[Array[Double]]): Array[Double] = {
    val m = model.numSubspaces
    val k = model.codebookSize
    val out = new Array[Double](queryVecs.length * m * k)
    for (q <- queryVecs.indices; mi <- 0 until m; ki <- 0 until k) {
      val base = (mi * k + ki) * model.subDim
      var d = 0.0
      var j = 0
      while (j < model.subDim) {
        val diff = queryVecs(q)(mi * model.subDim + j) - model.flat(base + j)
        d += diff * diff
        j += 1
      }
      out((q * m + mi) * k + ki) = d
    }
    out
  }

  /** Batch ADC top-k: one scan of the codes table scores every (row, query)
    * pair against driver-computed distance tables; per-query top-k by
    * (adc asc, id asc). Queries are driver-collected and capped (fail-fast)
    * exactly like the blocked kNN path.
    *
    * Output: (query_id, id, rank, adc) with rank 1..k.
    */
  /** Queries collected ONCE behind the fail-fast cap — the caller's query
    * lineage never re-runs (the [[IvfPq]] discipline); both the ADC pass
    * and the re-rank rebuild their query sides from this collect.
    */
  private case class CollectedQueries(
      qIds: Array[Long], qVecs: Array[Array[Double]])

  private def collectQueries(
      queries: DataFrame, model: PqModel,
      queryIdCol: String, queryVecCol: String,
      maxQueries: Int): CollectedQueries = {
    val probeLimit = math.min(maxQueries.toLong + 1, Int.MaxValue.toLong).toInt
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      .limit(probeLimit).collect()
    require(qRows.length <= maxQueries,
      s"query set exceeds maxQueries=$maxQueries; batch it or raise the cap")
    require(qRows.nonEmpty, "empty query set")
    val sorted = qRows.sortBy(_.getLong(0))
    val qVecs = sorted.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray)
    qVecs.foreach(v => require(v.length == model.dim,
      s"query dim ${v.length} != model dim ${model.dim}"))
    CollectedQueries(sorted.map(_.getLong(0)), qVecs)
  }

  private def adcTopK(
      codes: DataFrame, model: PqModel, q: CollectedQueries, k: Int): DataFrame = {
    val tables = adcTables(model, q.qVecs)
    val scored = codes
      .select(col("id"), col("codes"),
        explode(sequence(lit(0), lit(q.qIds.length - 1))).as("q_idx"))
      .select(col("id"),
        element_at(typedLit(q.qIds.toSeq), col("q_idx") + 1).as("query_id"),
        Bridge.column(PqAdcScore(
          Bridge.expression(col("codes")), Bridge.expression(col("q_idx").cast("int")),
          tables, model.numSubspaces, model.codebookSize)).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k) // rank-limit: plans as WindowGroupLimit
      .select(col("query_id"), col("id"), col("rank"), col("adc"))
  }

  def searchBatchAdc(
      codes: DataFrame, queries: DataFrame, model: PqModel, k: Int,
      queryIdCol: String = "query_id", queryVecCol: String = "query_vec",
      maxQueries: Int = graft.operators.Knn.DefaultMaxBlockedQueries): DataFrame =
    adcTopK(codes, model,
      collectQueries(queries, model, queryIdCol, queryVecCol, maxQueries), k)

  /** Two-phase batch search: ADC over-fetch, then exact float-cosine
    * re-rank of the candidates (the [[Quantize.searchRerank]] discipline,
    * batched). The re-rank query side is rebuilt from the one driver
    * collect and broadcast — the caller's query lineage runs exactly once,
    * and the collected vectors are exact float->double widenings, so
    * re-rank scores are bit-identical to scoring the original column.
    * Output: (query_id, id, rank, score).
    */
  def searchRerankBatch(
      codes: DataFrame, vectors: DataFrame, queries: DataFrame, model: PqModel,
      k: Int, overFetch: Int = 4,
      idCol: String = "id", vecCol: String = "vector",
      queryIdCol: String = "query_id", queryVecCol: String = "query_vec",
      maxQueries: Int = graft.operators.Knn.DefaultMaxBlockedQueries): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val q = collectQueries(queries, model, queryIdCol, queryVecCol, maxQueries)
    val cand = adcTopK(codes, model, q, k * overFetch)
      .select(col("query_id"), col("id"))
    val queryDf = q.qIds.zip(q.qVecs.map(_.toSeq)).toSeq.toDF("query_id", "_qv")
    val exact = cand
      .join(vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("_v")),
        Seq("id"))
      .join(broadcast(queryDf), Seq("query_id"))
      .select(col("query_id"), col("id"),
        graft.functions.vector.cosine_sim(col("_v"), col("_qv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"), col("score"))
  }
}

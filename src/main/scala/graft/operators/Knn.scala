package graft.operators

import graft.functions.vector
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Conjunctive metadata equality predicate over a map<string,string> column —
    * the reference's only filter form (service/optimized_vector_store.py:159-167).
    */
  def metadataPredicate(metaCol: Column, filter: Map[String, String]): Column =
    filter.foldLeft(lit(true)) { case (acc, (k, v)) => acc && metaCol(k) === lit(v) }

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
      metaCol: String = "meta"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = typedLit(queryVec)
    val filtered =
      if (metadataFilter.isEmpty) store
      else store.filter(metadataPredicate(col(metaCol), metadataFilter))
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
      row_number().over(Window.orderBy(col("similarity_score").desc +: tieBreak: _*)))
  }

  /** Batch kNN: for every row of `queries` (queryIdCol, queryVecCol), the k
    * best rows of `store`. Scale path — bounded top-k aggregation.
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
      queryVecCol: String = "query_vec"): DataFrame = {
    val topk = udaf(new TopKAggregator(k, ascending = false))
    val scored = store
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
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
    val w = Window
      .orderBy(col(scoreCol).desc)
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

package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall measurement for the approximate retrieval paths — the Spark-native
  * answer to the reference's accuracy harness
  * (tests/performance_demo_hnsw.py:35-101, which sweeps HNSW parameters and
  * reports recall vs brute force). Every approximate operator in this engine
  * (pruned IVF, hyperplane-LSH dedup, SimHash banding) has an exact twin; the
  * operators here quantify the approximation against that twin as plain
  * DataFrames, so a recall sweep is itself an oracle-checkable query.
  *
  * Scale shape: two equi-joins + one aggregation. Both inputs are top-k
  * result sets (|queries| x k rows), orders of magnitude smaller than the
  * corpora they came from, so any join strategy works; the group-by key is
  * the query id, which is as close to uniform as keys get.
  */
object Recall {

  /** Per-query recall: the fraction of `exact`'s rows for each query that
    * also appear in `approx` for the same query. Inputs are result sets with
    * (queryIdCol, idCol) — extra columns (rank, score) are ignored.
    *
    * Output: (queryIdCol, n_hit, n_exact, recall), one row per query present
    * in `exact`; queries the approximate path missed entirely get recall 0.
    */
  def recallAtK(
      approx: DataFrame,
      exact: DataFrame,
      queryIdCol: String = "query_id",
      idCol: String = "id"): DataFrame = {
    val a = approx.select(col(queryIdCol), col(idCol)).dropDuplicates(queryIdCol, idCol)
    val hits = exact.select(col(queryIdCol), col(idCol))
      .join(a, Seq(queryIdCol, idCol))
      .groupBy(col(queryIdCol)).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col(queryIdCol)).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq(queryIdCol), "left")
      .select(
        col(queryIdCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("n_exact"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** Collapse [[recallAtK]] output to a single corpus-level row:
    * (n_hit, n_exact, recall) with recall = sum(hits) / sum(exact) — the
    * micro-averaged recall (every (query, neighbor) pair weighs equally).
    * The division is one IEEE double op over two exact integers, so it is
    * bit-identical across engines.
    *
    * Empty-input semantics: an empty per-query frame (no exact results at
    * all) yields (0, 0, 1.0) — vacuous truth is trivially fully recovered.
    * Defined explicitly so a degenerate sweep can never smuggle a NaN into
    * a hash-checked contract row.
    */
  def summarize(perQuery: DataFrame): DataFrame =
    perQuery
      .agg(coalesce(sum(col("n_hit")), lit(0L)).as("n_hit"),
        coalesce(sum(col("n_exact")), lit(0L)).as("n_exact"))
      .select(col("n_hit"), col("n_exact"),
        when(col("n_exact") === 0L, lit(1.0))
          .otherwise(col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall"))

  /** Pair recall for the near-dup families: the fraction of ground-truth
    * pairs (truth, e.g. the exact all-pairs twin) that the candidate-based
    * path (found) recovered. One row: (n_truth, n_found, recall).
    *
    * Empty-truth semantics: n_truth = 0 yields (0, 0, 1.0) — no true pairs
    * means nothing was missed — instead of a 0/0 NaN that would silently
    * poison a hash-checked contract row.
    */
  def pairRecall(
      found: DataFrame,
      truth: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val f = found.select(col(idACol).as("id_a"), col(idBCol).as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("_hit", lit(1))
    truth.select(col(idACol).as("id_a"), col(idBCol).as("id_b"))
      .join(f, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"), count(col("_hit")).as("n_found"))
      .select(col("n_truth"), col("n_found"),
        when(col("n_truth") === 0L, lit(1.0))
          .otherwise(col("n_found").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }
}

package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-judged retrieval evaluation: recall@k, precision@k, MRR and
  * nDCG@k of a ranked result set against a gold relevance table — the IR
  * complement of [[Recall]] (which scores an approximate path against its
  * own exact twin, not against ground-truth labels). This is how a RAG or
  * embedding pipeline is actually graded: run the retriever over a query
  * set, join the judgments, read the per-query metrics. The reference's
  * accuracy harness stops at self-recall (tests/performance_demo_hnsw.py);
  * the judged-metrics layer is an engine extension following the standard
  * IR definitions (Manning, Raghavan & Schütze, "Introduction to
  * Information Retrieval", 2008, §8.4).
  *
  * Engine-portability of the emitted doubles, per column:
  * `recall_at_k` (hits/n_gold), `precision_at_k` (hits/k) and `rr`
  * (1/first_rank) are each ONE correctly-rounded IEEE division over exact
  * integers — bit-identical on any IEEE engine, safe to hash-compare.
  * `dcg`/`idcg`/`ndcg` go through libm `log` (not correctly rounded, the
  * [[graft.text.TextAnalysis.pmiBigrams]] pmi caveat) AND sum float terms
  * in rank order — deterministic here (the sum folds over a per-query
  * sorted array, not a partial-aggregation tree) but 1-ulp-fragile across
  * engines: rank by them, hash-compare the division-only columns.
  *
  * Scale shape: both inputs are RESULT-SIZED (|queries| x k and
  * |queries| x judgments), orders of magnitude below the corpora they
  * came from; two equi-joins on (query, id), one per-query aggregation,
  * no window over raw data, nothing corpus-sized anywhere.
  */
object RetrievalEval {

  /** Judge `results` against `gold`.
    *
    * `results`: one row per retrieved item — (queryIdCol, idCol, rankCol)
    * with rank 1-based; rows with rank > k are ignored, so callers can
    * pass a deeper result set and sweep k without re-retrieving.
    * `gold`: one row per relevant (queryIdCol, idCol) pair. Queries
    * present in `gold` but missing from `results` still get a row (all
    * misses); queries with no gold judgments are not scored.
    *
    * `gradeCol` (optional, on `gold`): graded relevance — gains are the
    * standard 2^grade − 1, DCG sums gain/log2(rank+1) over hits, and IDCG
    * places the k highest gains at the top ranks. Absent, every judged
    * pair has gain 1 (binary relevance; 2^1 − 1). Duplicate judgments
    * keep the HIGHEST grade. Judged-IRRELEVANT pairs (grade <= 0, the
    * TREC qrels convention) are dropped after the max-grade dedup: they
    * count as relevant for NO metric — not hits/recall/rr (retrieving a
    * judged-irrelevant doc is a miss) and not dcg (their gain is <= 0
    * anyway). A query whose judgments are ALL grade <= 0 has no relevant
    * set and is not scored, which also keeps idcg > 0 for every emitted
    * row; ndcg is additionally NULL-guarded on idcg > 0.
    *
    * Output, one row per judged query:
    * (query, n_gold, hits BIGINT, first_rank BIGINT or NULL,
    *  recall_at_k, precision_at_k, rr, dcg, idcg, ndcg — all DOUBLE).
    * `rr` is 0.0 for all-miss queries (the MRR convention); `ndcg` is
    * dcg/idcg, idcg truncated at min(n_gold, k).
    */
  def judge(
      results: DataFrame,
      gold: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      idCol: String = "id",
      rankCol: String = "rank",
      gradeCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")

    val res = results
      .select(col(queryIdCol).as("_q"), col(idCol).as("_id"),
        col(rankCol).cast("long").as("_rnk"))
      .filter(col("_rnk") >= 1L && col("_rnk") <= k)
    // a NULL grade is a judgment without a level — binary relevance, not
    // a NULL that would poison the dcg sum
    val grade = gradeCol.fold(lit(1.0))(g =>
      coalesce(col(g).cast("double"), lit(1.0)))
    val gld = gold
      .select(col(queryIdCol).as("_q"), col(idCol).as("_id"),
        grade.as("_grade"))
      .groupBy(col("_q"), col("_id"))
      .agg(max(col("_grade")).as("_grade"))
      .filter(col("_grade") > 0.0) // judged-irrelevant: relevant for nothing
      .withColumn("_gain", pow(lit(2.0), col("_grade")) - lit(1.0))

    // DCG term: gain / log2(rank + 1)
    val dcgTerm = col("_gain") / log2(col("_rnk").cast("double") + lit(1.0))

    val perQuery = gld.join(res, Seq("_q", "_id"))
      .groupBy(col("_q"))
      .agg(
        count(lit(1)).as("hits"),
        min(col("_rnk")).as("first_rank"),
        sum(dcgTerm).as("dcg"))

    val nGold = gld.groupBy(col("_q")).agg(
      count(lit(1)).as("n_gold"),
      sort_array(collect_list(col("_gain")), asc = false).as("_gains"))

    // ideal DCG: the min(n_gold, k) HIGHEST gains at the top ranks
    val idcg = aggregate(
      sequence(lit(1L), least(col("n_gold"), lit(k.toLong))),
      lit(0.0),
      (acc, i) => acc +
        element_at(col("_gains"), i.cast("int")) /
          log2(i.cast("double") + lit(1.0)))

    nGold.join(perQuery, Seq("_q"), "left")
      .select(
        col("_q").as(queryIdCol),
        col("n_gold"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("first_rank"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_gold").cast("double")).as("recall_at_k"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("precision_at_k"),
        coalesce(lit(1.0) / col("first_rank").cast("double"), lit(0.0)).as("rr"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        idcg.as("idcg"),
        when(idcg > 0.0, coalesce(col("dcg"), lit(0.0)) / idcg).as("ndcg"))
  }

  /** Collapse [[judge]] output to one corpus row of macro-averages:
    * (n_queries, mean_recall, mrr, mean_ndcg). Float means over a partial
    * aggregation sum in nondeterministic order — report, plot, and
    * spec-test with tolerances; hash-compare the per-query rows instead
    * (the [[Recall.summarize]] caveat, which applies to any distributed
    * float mean).
    */
  def summarize(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall_at_k")).as("mean_recall"),
      avg(col("rr")).as("mrr"),
      avg(col("ndcg")).as("mean_ndcg"))
}

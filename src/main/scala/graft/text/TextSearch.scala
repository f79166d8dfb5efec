package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval + hybrid fusion (scale extension).
  *
  * The reference serves vector search and a RAG pipeline
  * (core/rag/mlx_rag_native.py); production RAG retrieval is HYBRID —
  * lexical top-k fused with vector top-k. This module supplies the lexical
  * side (Okapi BM25) and the fusion (reciprocal-rank fusion) as pure
  * DataFrame transforms.
  *
  * Scale shape: scoring is two corpus passes — one aggregate for corpus
  * statistics (doc count, avg doc length, per-term document frequencies:
  * ONE row, broadcast back), one codegen'd projection computing tf and the
  * score per document — then a TakeOrderedAndProject top-k. No shuffle
  * wider than the single stats row and the final k rows; no UDF.
  *
  * Determinism: BM25 arithmetic is written in a fixed association order so
  * an external oracle computing the same formula bit-matches the double
  * score (JVM Math.log and libm ln agree bitwise; integer tf/dl/df make
  * every other operand exact).
  */
object TextSearch {

  /** Per-term frequency inside a whitespace token array. */
  def termFreq(toks: Column, term: String): Column =
    size(filter(toks, t => t === lit(term)))

  /** BM25 top-k over `df` for a bag-of-terms query.
    *
    * Output: (id, score, rank) — rank 1..k by (score desc, id asc).
    * k1/b are the standard Okapi defaults; idf uses the Lucene-style
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` (always positive).
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // bag semantics: a repeated query term contributes its full score once
    // per occurrence (computed once, weighted by multiplicity)
    val termWeights = queryTerms.groupBy(identity).view.mapValues(_.size).toMap
    val terms = queryTerms.distinct

    // one row per doc: dl + tf per query term (single codegen'd projection)
    val perDocCols =
      col(idCol).cast("long").as("id") +:
        size(split(col(textCol), " ")).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          termFreq(split(col(textCol), " "), t).as(s"tf_$i")
        }
    val perDoc = df.select(perDocCols: _*)

    // corpus statistics: ONE row (N, sum_dl, df per term), broadcast back
    val statCols =
      sum(col("dl")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), statCols: _*)

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    // fixed association order: term scores summed left-to-right, each term =
    // idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*(dl/avgdl)))
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = col(s"tf_$i").cast("double")
      val dfT = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      val one = idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
      val w = termWeights(t)
      if (w == 1) one else one * lit(w.toDouble)
    }.reduceLeft(_ + _)

    perDoc.crossJoin(broadcast(stats))
      .select(col("id"), score.as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("score"),
        graft.functions.windows.boundedRank(col("score").desc, col("id").asc)
          .cast("long").as("rank"))
  }

  /** Reciprocal-rank fusion of two ranked lists: fused = sum over lists of
    * 1/(k0 + rank), missing entries contribute 0. Output: (id, fused_score,
    * rank 1..k by fused desc, id asc). k0=60 is the standard RRF constant.
    * The fused doubles are exact IEEE sums of unit fractions in a fixed
    * order, so an oracle writing `1/(k0+ra) + 1/(k0+rb)` bit-matches.
    */
  def rrfFuse(
      a: DataFrame, // (id, rank)
      b: DataFrame, // (id, rank)
      k: Int = 10,
      k0: Int = 60): DataFrame = {
    val ra = a.select(col("id").cast("long").as("id"), col("rank").as("rank_a"))
    val rb = b.select(col("id").cast("long").as("id"), col("rank").as("rank_b"))
    val fused = ra.join(rb, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_a").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_b").cast("double")), lit(0.0)))
          .as("fused_score"))
    fused
      .orderBy(col("fused_score").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("fused_score"),
        graft.functions.windows.boundedRank(col("fused_score").desc, col("id").asc)
          .cast("long").as("rank"))
  }
}

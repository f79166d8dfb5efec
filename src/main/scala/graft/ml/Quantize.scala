package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the storage/scan scale
  * path for similarity workloads. A 100 TB float32 embedding corpus is
  * 25 TB as int8: 4× less scan IO and 4× more vectors per executor, at a
  * recall cost recovered by an exact re-rank of the short candidate list.
  * (The reference serves float32 from RAM — `performance/mlx_optimized.py`
  * — and never needs this; a Spark corpus at rest does.)
  *
  * Quantization is symmetric per-vector max-abs: q_j = ⌊x_j·127/s + 0.5⌋
  * with s = max_j |x_j| (zero vectors quantize to zeros, scale 0). Every
  * step is IEEE-exact and written in one fixed order, so any engine
  * reproduces the codes bit-for-bit — which makes quantized scores (exact
  * integer dot products rescaled once) oracle-checkable.
  */
object Quantize {

  /** Per-vector max-abs scale: `max_j |x_j|` as double (float inputs widen
    * exactly).
    */
  def maxAbsScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 codes: ⌊x·127/s + 0.5⌋ per element, clamped to
    * [-127, 127] (the +0.5-floor form is round-half-up, reproducible
    * exactly in any engine; Spark's round() is HALF_UP too but other
    * engines' round() may be HALF_EVEN — the floor form sidesteps that).
    */
  def int8Codes(vec: Column, scale: Column): Column =
    when(scale > 0,
      transform(vec, x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") * lit(127.0) / scale + lit(0.5)).cast("long")))))
      .otherwise(transform(vec, _ => lit(0L)))

  /** Add `codes` (array<long> in [-127,127]) and `scale` (double) columns
    * computed from `vecCol`. Codes stay long for exact integer dot
    * products downstream; a store sink would pack them to bytes.
    */
  def quantized(df: DataFrame, vecCol: String): DataFrame = {
    val s = maxAbsScale(col(vecCol))
    df.withColumn("scale", s).withColumn("codes", int8Codes(col(vecCol), col("scale")))
  }

  /** Exact integer dot product of two code arrays (zip-multiply-sum; every
    * partial fits a long: 64 dims × 127² ≪ 2^63).
    */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Dequantized similarity score: intDot · s_a · s_b / 127² — one fixed
    * association order (left-to-right), bit-reproducible.
    */
  def dequantScore(dot: Column, scaleA: Column, scaleB: Column): Column =
    dot.cast("double") * scaleA * scaleB / lit(127.0 * 127.0)

  /** Quantized top-k search: score every row of `df` against one query
    * vector on int8 codes, return (id, rank) for the top `k` by
    * (score desc, id asc). The scan reads CODES (4× smaller at rest);
    * the plan is the same broadcast-score-TakeOrdered shape as exact kNN.
    *
    * For recall-critical serving, over-fetch here (k' = 4k) and re-rank
    * the k' candidates with exact float cosine — [[searchRerank]].
    */
  def search(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Float], k: Int): DataFrame = {
    val q = quantized(
      df.sparkSession.range(1).select(
        typedLit(queryVec).as("qv")), "qv")
      .select(col("codes").as("q_codes"), col("scale").as("q_scale"))
    val scored = quantized(df, vecCol).crossJoin(broadcast(q))
      .select(col(idCol).cast("long").as("id"),
        dequantScore(intDot(col("codes"), col("q_codes")),
          col("scale"), col("q_scale")).as("qscore"))
    scored.orderBy(col("qscore").desc, col("id").asc).limit(k)
      .select(col("id"),
        graft.functions.windows.boundedRank(col("qscore").desc, col("id").asc)
          .cast("long").as("rank"))
  }

  /** Two-phase search: quantized top-`overFetch·k` candidate scan, exact
    * float-cosine re-rank of the candidates to final top-k. The wide scan
    * touches only int8 codes; full floats are gathered for ≤ overFetch·k
    * rows (the ANN over-fetch discipline of SURVEY §2.2 P2 applied to
    * quantization).
    */
  def searchRerank(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Float], k: Int, overFetch: Int = 4): DataFrame = {
    val cand = search(df, idCol, vecCol, queryVec, k * overFetch)
      .select(col("id"))
    val qv = typedLit(queryVec)
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .join(broadcast(cand), Seq("id"))
      .select(col("id"),
        graft.functions.vector.cosine_sim(col("v"), qv).as("score"))
      .orderBy(col("score").desc, col("id").asc).limit(k)
      .select(col("id"),
        graft.functions.windows.boundedRank(col("score").desc, col("id").asc)
          .cast("long").as("rank"))
  }
}

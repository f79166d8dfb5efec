package graft.text

import graft.functions.{BpeCount, BpeSegment, BpeUtil}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

/** Byte-pair-encoding tokenizer (Sennrich/Haddow/Birch 2016) — the token
  * accounting layer of a training-data pipeline: mixing budgets, context
  * packing, and per-source token counts are all denominated in TOKENIZER
  * tokens, not whitespace words (the regex token counter in
  * [[TextAnalysis]] approximates; this learns the real merge table).
  *
  * Spark-first split of the work, mirroring how published tokenizers are
  * actually trained at corpus scale:
  *  - the WORD-FREQUENCY DICT is computed distributed (explode -> hash
  *    aggregate; the shuffle carries (word, partial count) pairs only) and
  *    only the top `maxDictWords` rows come to the driver — the dict is
  *    bounded however big the corpus is;
  *  - the merge LOOP runs driver-side over that dict (it is inherently
  *    sequential — merge i+1 depends on i — and operates on KBs);
  *  - APPLYING the table is the distributed pass that must scale: a
  *    codegen'd expression per row against the broadcast-by-reference rank
  *    map ([[graft.functions.BpeSegment]] / [[graft.functions.BpeCount]]).
  *
  * Determinism: merge ties break to the lexicographically smallest pair,
  * so the same dict always yields the same table on any engine.
  */
object BpeTokenizer {

  /** A trained merge table, in learned order. */
  case class BpeModel(merges: Seq[(String, String)]) {
    @transient lazy val ranks: BpeUtil.Ranks = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(BpeUtil.rankKey(a, b), i)
      }
      m
    }
  }

  /** Distributed word-count pass, then the driver-side merge loop. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int = 256,
      maxDictWords: Int = 50000): BpeModel = {
    val dict = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxDictWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromDict(dict, numMerges)
  }

  /** Classic greedy BPE over a word-frequency dict: repeatedly merge the
    * most frequent adjacent symbol pair (ties to the lexicographically
    * smallest pair), rewriting the dict after each merge.
    */
  def trainFromDict(dict: Seq[(String, Long)], numMerges: Int): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab: Seq[(Vector[String], Long)] = dict.collect {
      case (w, c) if w.nonEmpty =>
        val chars = w.map(String.valueOf(_)).toVector
        (chars.init :+ (chars.last + BpeUtil.EndOfWord), c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
          case (acc, kv @ (p, c)) => acc match {
            case Some((bp, bc)) if bc > c => acc
            case Some((bp, bc)) if bc == c &&
              (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
            case _ => Some(kv)
          }
        }.get._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined
              i += 2
            } else {
              out += syms(i)
              i += 1
            }
          }
          (out.result(), c)
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  /** BPE symbol array for a text column (codegen'd). */
  def bpeTokens(text: Column, model: BpeModel): Column =
    Bridge.column(BpeSegment(Bridge.expression(text), model.ranks))

  /** BPE token count for a text column — no array materialization. */
  def bpeTokenCount(text: Column, model: BpeModel): Column =
    Bridge.column(BpeCount(Bridge.expression(text), model.ranks))

  /** Per-group token budget: (groupCol, n_docs, n_tokens) — the number the
    * mixing recipe ([[graft.operators.Curation.weightedSample]] rates, data
    * cards) is denominated in. One scan; the shuffle moves one partial sum
    * per group per task.
    */
  def tokenBudget(
      docs: DataFrame, groupCol: String, textCol: String,
      model: BpeModel): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(bpeTokenCount(col(textCol), model)).as("n_tokens"))
}

package graft.text

import graft.functions.LmPerplexity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

/** N-gram language-model perplexity filtering — the CCNet recipe's third
  * leg (alongside dedup and the quality classifier): score every document
  * by a small LM trained on a reference corpus, keep the low-perplexity
  * (in-domain) tail. CCNet uses a KenLM 5-gram; the engine-native
  * equivalent is an add-k-smoothed bigram model, which keeps the count
  * tables broadcastable and the scoring pass a single codegen'd scan.
  *
  * Spark-first split (same discipline as [[BpeTokenizer]]):
  *  - COUNTS are distributed aggregations (explode -> hash aggregate; the
  *    shuffle carries (gram, partial count) pairs);
  *  - the PRUNED tables (top-`maxVocab` unigrams, bigrams over `minCount`
  *    within that vocab) are driver-collected behind fail-fast caps — at
  *    100 TB pruning is what makes the published approach work too: KenLM
  *    tables ship to every worker;
  *  - SCORING is one broadcast-table expression per row, no shuffle.
  */
object NgramLm {

  /** Bounded, broadcastable model. */
  case class LmModel(
      unigrams: java.util.HashMap[String, java.lang.Long],
      bigrams: java.util.HashMap[String, java.lang.Long],
      vocabSize: Int,
      totalTokens: Long,
      k: Double)

  /** Maximum collected bigram rows — 2M entries is tens of MB broadcast,
    * the practical ceiling for executor-resident tables.
    */
  val DefaultMaxBigrams: Int = 1 << 21

  def train(
      docs: DataFrame,
      textCol: String,
      maxVocab: Int = 65536,
      minBigramCount: Long = 2L,
      k: Double = 0.1,
      maxBigrams: Int = DefaultMaxBigrams): LmModel = {
    val toks = docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    // top-maxVocab unigrams by (count desc, word asc) — deterministic prune
    val uniRows = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxVocab).collect()
    val unigrams = new java.util.HashMap[String, java.lang.Long](uniRows.length * 2)
    var total = 0L
    uniRows.foreach { r =>
      unigrams.put(r.getString(0), r.getLong(1))
      total += r.getLong(1)
    }
    require(total > 0, "empty training corpus")

    val biLimit = math.min(maxBigrams.toLong + 1, Int.MaxValue.toLong).toInt
    // normalize runs of whitespace before the single-space n-gram kernel so
    // bigram tokenization agrees with the \s+ splits above and in the scorer
    val biRows = docs
      .select(explode(graft.operators.Curation.tokenNgrams(
        trim(regexp_replace(col(textCol), "\\s+", " ")), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minBigramCount)
      .orderBy(col("c").desc, col("g").asc)
      .limit(biLimit).collect()
    require(biRows.length <= maxBigrams,
      s"bigram table exceeds maxBigrams=$maxBigrams; raise minBigramCount")
    val bigrams = new java.util.HashMap[String, java.lang.Long](biRows.length * 2)
    biRows.foreach { r =>
      // keep only bigrams whose history survives the vocab prune — the
      // scorer backs off through the unigram table for everything else
      if (unigrams.containsKey(r.getString(0).takeWhile(_ != ' ')))
        bigrams.put(r.getString(0), r.getLong(1))
    }
    LmModel(unigrams, bigrams, unigrams.size(), total, k)
  }

  /** Interpolated Kneser–Ney model: the add-k table plus the KN
    * statistics, every one derived DRIVER-SIDE from the already-pruned
    * bigram table (no extra Spark jobs, and an external engine replays
    * training exactly because the prune is deterministic):
    * c(h·)/N1+(h,·) per history, N1+(·,w) per continuation word,
    * B = pruned bigram types.
    */
  case class KnModel(
      bigrams: java.util.HashMap[String, java.lang.Long],
      histTotals: java.util.HashMap[String, java.lang.Long],
      histDistinct: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      bTypes: Long,
      vocabSize: Int,
      d: Double,
      k: Double)

  /** Train the interpolated-KN upgrade of [[train]]'s bigram model
    * (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form with a
    * fixed discount `d`, the standard 0.75). Same distributed count +
    * deterministic prune as [[train]]; the KN continuation/history
    * statistics are a driver pass over the collected table. `k`
    * regularizes the continuation base so out-of-table tokens keep a
    * nonzero probability (the closed-vocab stand-in for <unk>).
    */
  def trainKn(
      docs: DataFrame,
      textCol: String,
      maxVocab: Int = 65536,
      minBigramCount: Long = 2L,
      d: Double = 0.75,
      k: Double = 0.1,
      maxBigrams: Int = DefaultMaxBigrams): KnModel = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val m = train(docs, textCol, maxVocab, minBigramCount, k, maxBigrams)
    val histTotals = new java.util.HashMap[String, java.lang.Long]()
    val histDistinct = new java.util.HashMap[String, java.lang.Long]()
    val contCounts = new java.util.HashMap[String, java.lang.Long]()
    val it = m.bigrams.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val sp = g.indexOf(' ')
      val h = g.substring(0, sp)
      val w = g.substring(sp + 1)
      val ht = histTotals.get(h)
      histTotals.put(h, (if (ht == null) 0L else ht.longValue()) + e.getValue.longValue())
      val hd = histDistinct.get(h)
      histDistinct.put(h, (if (hd == null) 0L else hd.longValue()) + 1L)
      val cc = contCounts.get(w)
      contCounts.put(w, (if (cc == null) 0L else cc.longValue()) + 1L)
    }
    require(m.bigrams.size() > 0,
      "KN needs a nonempty pruned bigram table; lower minBigramCount")
    KnModel(m.bigrams, histTotals, histDistinct, contCounts,
      m.bigrams.size().toLong, m.vocabSize, d, k)
  }

  /** Kneser–Ney perplexity column (codegen'd, no shuffle). */
  def perplexityKn(text: Column, model: KnModel): Column =
    Bridge.column(graft.functions.LmKnPerplexity(Bridge.expression(text),
      model.bigrams, model.histTotals, model.histDistinct, model.contCounts,
      model.bTypes, model.vocabSize, model.d, model.k))

  /** KN per-token log2-probability array (codegen'd, no shuffle) — the
    * token-level surface [[minKProbKn]] aggregates.
    */
  def tokenLogProbsKn(text: Column, model: KnModel): Column =
    Bridge.column(graft.functions.LmKnTokenLogProbs(Bridge.expression(text),
      model.bigrams, model.histTotals, model.histDistinct, model.contCounts,
      model.bTypes, model.vocabSize, model.d, model.k))

  /** Perplexity column for a text column (codegen'd, no shuffle). */
  def perplexity(text: Column, model: LmModel): Column =
    Bridge.column(LmPerplexity(Bridge.expression(text), model.unigrams,
      model.bigrams, model.vocabSize, model.totalTokens, model.k))

  /** Keep docs under the perplexity ceiling — the CCNet "head/middle" cut.
    * A pure filter: zero shuffle, deterministic.
    */
  def filterByPerplexity(
      docs: DataFrame, textCol: String, model: LmModel,
      maxPerplexity: Double): DataFrame =
    docs.filter(perplexity(col(textCol), model) <= maxPerplexity)

  /** Per-token log2-probability array (codegen'd, no shuffle) — the
    * token-level scoring surface [[minKProb]] aggregates; perplexity is
    * `2^(-mean)` of it by construction.
    */
  def tokenLogProbs(text: Column, model: LmModel): Column =
    Bridge.column(graft.functions.LmTokenLogProbs(Bridge.expression(text),
      model.unigrams, model.bigrams, model.vocabSize, model.totalTokens,
      model.k))

  /** Min-K% Prob membership-inference score (Shi et al. 2024, "Detecting
    * Pretraining Data from Large Language Models" — the published recipe,
    * applied with the engine-native bigram LM): the mean of each
    * document's LOWEST ceil(frac x T) token log-probabilities. A document
    * the model has effectively memorized predicts even its least-likely
    * tokens well (score near 0); an unseen document's outlier tokens drag
    * the score down. The memorization-risk audit runs over candidate
    * training documents against an LM trained on the corpus under
    * suspicion — the probabilistic complement of the exact n-gram
    * decontamination family.
    *
    * Output: (id, n_tokens, mink_avg_logprob DOUBLE) — one row per doc;
    * an empty document scores NULL (no evidence).
    *
    * Scale shape: one codegen'd scan — the model is broadcast inside the
    * expression, the per-doc sort/slice/fold are array functions over
    * that doc's own tokens, and no shuffle exists at all.
    */
  def minKProb(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LmModel,
      frac: Double = 0.2): DataFrame =
    minKFrom(docs, idCol, tokenLogProbs(col(textCol), model), frac)
  /** [[minKProb]] under the interpolated-KN model ([[trainKn]]) — the
    * same bottom-k fold over the better-calibrated per-token surface
    * (membership-inference power tracks LM quality: a smoothing that
    * models real continuations tightens the in-train/held-out gap).
    */
  def minKProbKn(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: KnModel,
      frac: Double = 0.2): DataFrame =
    minKFrom(docs, idCol, tokenLogProbsKn(col(textCol), model), frac)

  private def minKFrom(
      docs: DataFrame,
      idCol: String,
      lp: Column,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    docs
      .select(col(idCol).cast("long").as("id"), lp.as("_lp"))
      .withColumn("n_tokens", size(col("_lp")).cast("long"))
      .withColumn("_kk",
        greatest(ceil(lit(frac) * col("n_tokens")), lit(1L)).cast("int"))
      .select(col("id"), col("n_tokens"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(
            aggregate(slice(sort_array(col("_lp")), lit(1), col("_kk")),
              lit(0.0), (acc, x) => acc + x) / col("_kk"))
          .as("mink_avg_logprob"))
  }

}

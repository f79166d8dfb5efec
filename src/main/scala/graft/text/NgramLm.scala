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

  /** Interpolated TRIGRAM Kneser–Ney model — the real quality-gate floor
    * (the bigram [[KnModel]] is the standard textbook floor; production
    * perplexity gates run trigram+). EVERY statistic derives from ONE
    * pruned trigram table:
    *  - trigram level: c(uvw), with c(uv·)/N1+(uv·) per history;
    *  - middle level: continuation counts N1+(·vw) (distinct u per (v,w)
    *    in the pruned table), with N1+(·v·)/N1+(v··) per middle history;
    *  - base: continuation N1+(··w) over middle types M, add-k
    *    regularized against vocab V.
    * The prune (count >= minTrigramCount, then (count desc, gram asc)
    * under `maxTrigrams`) is deterministic, so an external engine replays
    * training exactly — the q144 discipline at n=3.
    */
  case class Kn3Model(
      trigrams: java.util.HashMap[String, java.lang.Long],
      triHistTotals: java.util.HashMap[String, java.lang.Long],
      triHistDistinct: java.util.HashMap[String, java.lang.Long],
      midCounts: java.util.HashMap[String, java.lang.Long],
      midHistTotals: java.util.HashMap[String, java.lang.Long],
      midHistDistinct: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      mTypes: Long,
      vocabSize: Int,
      d: Double,
      k: Double)

  /** Train the trigram-KN upgrade of [[trainKn]]. Distributed work is one
    * exact distinct-word count (vocab size for the base regularizer) and
    * one trigram count aggregation; the prune collects under a fail-fast
    * cap and the KN statistics are one driver pass over the collected
    * table — the same scale shape as [[trainKn]] (KenLM tables ship to
    * every worker in the published recipe too; pruning is what makes it
    * work at 100 TB there as well).
    */
  def trainKn3(
      docs: DataFrame,
      textCol: String,
      maxVocab: Int = 65536,
      minTrigramCount: Long = 2L,
      d: Double = 0.75,
      k: Double = 0.1,
      maxTrigrams: Int = DefaultMaxBigrams): Kn3Model = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val toks = docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val vocabSize = math.min(
      toks.agg(countDistinct(col("w"))).head().getLong(0),
      maxVocab.toLong).toInt
    require(vocabSize > 0, "empty training corpus")
    val triLimit = math.min(maxTrigrams.toLong + 1, Int.MaxValue.toLong).toInt
    val triRows = docs
      .select(explode(graft.operators.Curation.tokenNgrams(
        trim(regexp_replace(col(textCol), "\\s+", " ")), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minTrigramCount)
      .orderBy(col("c").desc, col("g").asc)
      .limit(triLimit).collect()
    require(triRows.length <= maxTrigrams,
      s"trigram table exceeds maxTrigrams=$maxTrigrams; raise minTrigramCount")
    require(triRows.nonEmpty,
      "KN3 needs a nonempty pruned trigram table; lower minTrigramCount")
    val trigrams = new java.util.HashMap[String, java.lang.Long](triRows.length * 2)
    val triHistTotals = new java.util.HashMap[String, java.lang.Long]()
    val triHistDistinct = new java.util.HashMap[String, java.lang.Long]()
    val midCounts = new java.util.HashMap[String, java.lang.Long]()
    triRows.foreach { r =>
      val g = r.getString(0)
      val c = r.getLong(1)
      trigrams.put(g, c)
      val s1 = g.indexOf(' ')
      val s2 = g.indexOf(' ', s1 + 1)
      val h2 = g.substring(0, s2)
      val vw = g.substring(s1 + 1)
      val ht = triHistTotals.get(h2)
      triHistTotals.put(h2, (if (ht == null) 0L else ht.longValue()) + c)
      val hd = triHistDistinct.get(h2)
      triHistDistinct.put(h2, (if (hd == null) 0L else hd.longValue()) + 1L)
      // continuation count: each (u, v, w) table row is one distinct u
      val mc = midCounts.get(vw)
      midCounts.put(vw, (if (mc == null) 0L else mc.longValue()) + 1L)
    }
    val midHistTotals = new java.util.HashMap[String, java.lang.Long]()
    val midHistDistinct = new java.util.HashMap[String, java.lang.Long]()
    val contCounts = new java.util.HashMap[String, java.lang.Long]()
    val it = midCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val vw = e.getKey
      val sp = vw.indexOf(' ')
      val v = vw.substring(0, sp)
      val w = vw.substring(sp + 1)
      val mt = midHistTotals.get(v)
      midHistTotals.put(v, (if (mt == null) 0L else mt.longValue()) + e.getValue.longValue())
      val md = midHistDistinct.get(v)
      midHistDistinct.put(v, (if (md == null) 0L else md.longValue()) + 1L)
      val cc = contCounts.get(w)
      contCounts.put(w, (if (cc == null) 0L else cc.longValue()) + 1L)
    }
    Kn3Model(trigrams, triHistTotals, triHistDistinct, midCounts,
      midHistTotals, midHistDistinct, contCounts, midCounts.size().toLong,
      vocabSize, d, k)
  }

  /** Trigram-KN perplexity column (codegen'd, no shuffle). */
  def perplexityKn3(text: Column, model: Kn3Model): Column =
    Bridge.column(graft.functions.LmKn3Perplexity(Bridge.expression(text),
      model.trigrams, model.triHistTotals, model.triHistDistinct,
      model.midCounts, model.midHistTotals, model.midHistDistinct,
      model.contCounts, model.mTypes, model.vocabSize, model.d, model.k))

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

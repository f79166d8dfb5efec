package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bigram language-model scoring kernel (the CCNet/KenLM-style perplexity
  * filter's hot loop): one pass over a document's tokens against broadcast
  * count tables, add-k smoothed, inside whole-stage codegen.
  */
object LmUtil {

  /** THE scoring kernel — one copy, both surfaces fold over it. Per-token
    * log2 probabilities: first token against the unigram distribution;
    * token i > 0 against P(w_i | w_{i-1}) = (c(bigram)+k) / (c(w_{i-1}) +
    * k*V), unseen history backing off to the unigram estimate.
    */
  private def lps(
      words: Array[String],
      unigrams: java.util.HashMap[String, java.lang.Long],
      bigrams: java.util.HashMap[String, java.lang.Long],
      vocabSize: Int,
      totalTokens: Long,
      k: Double): Array[Double] = {
    val out = new Array[Double](words.length)
    val kv = k * vocabSize
    var i = 0
    var prev: String = null
    while (i < words.length) {
      val w = words(i)
      val cw = unigrams.get(w)
      val p =
        if (i == 0 || prev == null) {
          ((if (cw == null) 0L else cw.longValue()) + k) / (totalTokens + kv)
        } else {
          val ch = unigrams.get(prev)
          if (ch == null) {
            // unseen history: back off to the unigram estimate
            ((if (cw == null) 0L else cw.longValue()) + k) / (totalTokens + kv)
          } else {
            val cb = bigrams.get(prev + " " + w)
            ((if (cb == null) 0L else cb.longValue()) + k) /
              (ch.longValue() + kv)
          }
        }
      out(i) = math.log(p) / math.log(2.0)
      prev = w
      i += 1
    }
    out
  }

  def perplexity(
      text: UTF8String,
      unigrams: java.util.HashMap[String, java.lang.Long],
      bigrams: java.util.HashMap[String, java.lang.Long],
      vocabSize: Int,
      totalTokens: Long,
      k: Double): Double = {
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0.0
    val arr = lps(words, unigrams, bigrams, vocabSize, totalTokens, k)
    // Σ(-lp_i) in token order — IEEE negation is exact, so this is
    // bit-identical to the pre-refactor accumulate-negated-terms loop
    var h = 0.0
    var i = 0
    while (i < arr.length) { h += -arr(i); i += 1 }
    math.pow(2.0, h / words.length)
  }

  /** Interpolated Kneser–Ney per-token log2 probabilities (Kneser & Ney
    * 1995; the interpolated form and fixed discount per Chen & Goodman,
    * "An empirical study of smoothing techniques for language modeling",
    * 1999):
    *
    *   P(w|h) = max(c(h,w) − D, 0)/c(h·) + ((D · N1+(h,·))/c(h·)) · Pc(w)
    *   Pc(w)  = (N1+(·,w) + k) / (B + k·V)
    *
    * with c(h·)/N1+ totals derived from the PRUNED bigram table (so an
    * external engine replays training exactly), B = pruned bigram types,
    * and the continuation base add-k-regularized — the engine's
    * closed-vocab stand-in for KenLM's <unk> handling: pure KN gives an
    * out-of-table token probability 0 and the fold −∞. First tokens and
    * unseen histories score against Pc directly (the backoff target).
    * Every arithmetic step is written in the exact association the q144
    * oracle SQL mirrors.
    */
  private def lpsKn(
      words: Array[String],
      bigrams: java.util.HashMap[String, java.lang.Long],
      histTotals: java.util.HashMap[String, java.lang.Long],
      histDistinct: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      bTypes: Long,
      vocabSize: Int,
      d: Double,
      k: Double): Array[Double] = {
    val out = new Array[Double](words.length)
    val denomBase = bTypes + k * vocabSize
    var i = 0
    var prev: String = null
    while (i < words.length) {
      val w = words(i)
      val cc = contCounts.get(w)
      val base = ((if (cc == null) 0L else cc.longValue()) + k) / denomBase
      val ct = if (prev == null) null else histTotals.get(prev)
      val p =
        if (i == 0 || ct == null) base
        else {
          val cb = bigrams.get(prev + " " + w)
          val n1h = histDistinct.get(prev).longValue()
          math.max((if (cb == null) 0L else cb.longValue()) - d, 0.0) /
            ct.longValue() +
            ((d * n1h) / ct.longValue()) * base
        }
      out(i) = math.log(p) / math.log(2.0)
      prev = w
      i += 1
    }
    out
  }

  def perplexityKn(
      text: UTF8String,
      bigrams: java.util.HashMap[String, java.lang.Long],
      histTotals: java.util.HashMap[String, java.lang.Long],
      histDistinct: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      bTypes: Long,
      vocabSize: Int,
      d: Double,
      k: Double): Double = {
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0.0
    val arr = lpsKn(words, bigrams, histTotals, histDistinct, contCounts,
      bTypes, vocabSize, d, k)
    var h = 0.0
    var i = 0
    while (i < arr.length) { h += -arr(i); i += 1 }
    math.pow(2.0, h / words.length)
  }

  /** Per-token log2 probabilities under the interpolated-KN model — the
    * same kernel as [[perplexityKn]] (perplexity is 2^(-mean) of this by
    * construction, enforced by sharing [[lpsKn]]).
    */
  def tokenLogProbsKn(
      text: UTF8String,
      bigrams: java.util.HashMap[String, java.lang.Long],
      histTotals: java.util.HashMap[String, java.lang.Long],
      histDistinct: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      bTypes: Long,
      vocabSize: Int,
      d: Double,
      k: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      lpsKn(words, bigrams, histTotals, histDistinct, contCounts,
        bTypes, vocabSize, d, k))
  }

  /** Interpolated Kneser–Ney TRIGRAM per-token log2 probabilities — the
    * n=3 extension of [[lpsKn]] (the standard recursion, Chen & Goodman
    * 1999 §2.7): the highest level discounts raw trigram counts, the
    * middle level discounts CONTINUATION counts N1+(·vw) derived from the
    * same pruned trigram table, and the base is the add-k-regularized
    * continuation distribution:
    *
    *   P(w|u v) = max(c(uvw)−D, 0)/c(uv·) + (D·N1+(uv·)/c(uv·))·P(w|v)
    *   P(w|v)   = max(N1+(·vw)−D, 0)/N1+(·v·)
    *              + (D·N1+(v··)/N1+(·v·))·Pc(w)
    *   Pc(w)    = (N1+(··w) + k) / (M + k·V),  M = middle-table types
    *
    * First token scores against Pc, second against P(w|v); an unseen
    * trigram history falls to P(w|v), an unseen middle history to Pc —
    * each backoff target is exactly the next interpolation base, so the
    * recursion never skips a level. Every arithmetic step is written in
    * the exact association the q151 oracle SQL mirrors.
    */
  private def lpsKn3(
      words: Array[String],
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
      k: Double): Array[Double] = {
    val out = new Array[Double](words.length)
    val denomBase = mTypes + k * vocabSize
    var i = 0
    var prev: String = null
    var prev2: String = null
    while (i < words.length) {
      val w = words(i)
      val cc = contCounts.get(w)
      val base = ((if (cc == null) 0L else cc.longValue()) + k) / denomBase
      val mh = if (prev == null) null else midHistTotals.get(prev)
      val mid =
        if (mh == null) base
        else {
          val mc = midCounts.get(prev + " " + w)
          val nd = midHistDistinct.get(prev).longValue()
          math.max((if (mc == null) 0L else mc.longValue()) - d, 0.0) /
            mh.longValue() +
            ((d * nd) / mh.longValue()) * base
        }
      val th = if (prev2 == null) null
        else triHistTotals.get(prev2 + " " + prev)
      val p =
        if (th == null) mid
        else {
          val tc = trigrams.get(prev2 + " " + prev + " " + w)
          val nd = triHistDistinct.get(prev2 + " " + prev).longValue()
          math.max((if (tc == null) 0L else tc.longValue()) - d, 0.0) /
            th.longValue() +
            ((d * nd) / th.longValue()) * mid
        }
      out(i) = math.log(p) / math.log(2.0)
      prev2 = prev
      prev = w
      i += 1
    }
    out
  }

  def perplexityKn3(
      text: UTF8String,
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
      k: Double): Double = {
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0.0
    val arr = lpsKn3(words, trigrams, triHistTotals, triHistDistinct,
      midCounts, midHistTotals, midHistDistinct, contCounts, mTypes,
      vocabSize, d, k)
    var h = 0.0
    var i = 0
    while (i < arr.length) { h += -arr(i); i += 1 }
    math.pow(2.0, h / words.length)
  }

  /** MODIFIED-KN trigram scorer (Chen & Goodman 1998): per-count
    * discounts D(1)=d1, D(2)=d2, D(>=3)=d3 with backoff mass
    * γ(h) = (d1·N1(h) + d2·N2(h) + d3·N3+(h)) / c(h); per-history Nr
    * arrive packed (N1 | N2<<21 | N3+<<42). Same three-level chain and
    * IEEE op order as [[lpsKn3]] otherwise, so the DuckDB twin replays
    * the arithmetic exactly.
    */
  private def lpsKn3Mod(
      words: Array[String],
      trigrams: java.util.HashMap[String, java.lang.Long],
      triHistTotals: java.util.HashMap[String, java.lang.Long],
      triHistN: java.util.HashMap[String, java.lang.Long],
      midCounts: java.util.HashMap[String, java.lang.Long],
      midHistTotals: java.util.HashMap[String, java.lang.Long],
      midHistN: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      mTypes: Long,
      vocabSize: Int,
      td1: Double, td2: Double, td3: Double,
      md1: Double, md2: Double, md3: Double,
      k: Double): Array[Double] = {
    def disc(c: Long, d1: Double, d2: Double, d3: Double): Double =
      if (c <= 0L) 0.0 else if (c == 1L) d1 else if (c == 2L) d2 else d3
    def gammaNum(packed: Long, d1: Double, d2: Double, d3: Double): Double = {
      val m = (1L << 21) - 1
      d1 * (packed & m) + d2 * ((packed >> 21) & m) + d3 * ((packed >> 42) & m)
    }
    val out = new Array[Double](words.length)
    val denomBase = mTypes + k * vocabSize
    var i = 0
    var prev: String = null
    var prev2: String = null
    while (i < words.length) {
      val w = words(i)
      val cc = contCounts.get(w)
      val base = ((if (cc == null) 0L else cc.longValue()) + k) / denomBase
      val mh = if (prev == null) null else midHistTotals.get(prev)
      val mid =
        if (mh == null) base
        else {
          val mc = midCounts.get(prev + " " + w)
          val c = if (mc == null) 0L else mc.longValue()
          val num = gammaNum(midHistN.get(prev).longValue(), md1, md2, md3)
          math.max(c - disc(c, md1, md2, md3), 0.0) / mh.longValue() +
            (num / mh.longValue()) * base
        }
      val th = if (prev2 == null) null
        else triHistTotals.get(prev2 + " " + prev)
      val p =
        if (th == null) mid
        else {
          val tc = trigrams.get(prev2 + " " + prev + " " + w)
          val c = if (tc == null) 0L else tc.longValue()
          val num = gammaNum(triHistN.get(prev2 + " " + prev).longValue(),
            td1, td2, td3)
          math.max(c - disc(c, td1, td2, td3), 0.0) / th.longValue() +
            (num / th.longValue()) * mid
        }
      out(i) = math.log(p) / math.log(2.0)
      prev2 = prev
      prev = w
      i += 1
    }
    out
  }

  def perplexityKn3Mod(
      text: UTF8String,
      trigrams: java.util.HashMap[String, java.lang.Long],
      triHistTotals: java.util.HashMap[String, java.lang.Long],
      triHistN: java.util.HashMap[String, java.lang.Long],
      midCounts: java.util.HashMap[String, java.lang.Long],
      midHistTotals: java.util.HashMap[String, java.lang.Long],
      midHistN: java.util.HashMap[String, java.lang.Long],
      contCounts: java.util.HashMap[String, java.lang.Long],
      mTypes: Long,
      vocabSize: Int,
      td1: Double, td2: Double, td3: Double,
      md1: Double, md2: Double, md3: Double,
      k: Double): Double = {
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0.0
    val arr = lpsKn3Mod(words, trigrams, triHistTotals, triHistN,
      midCounts, midHistTotals, midHistN, contCounts, mTypes,
      vocabSize, td1, td2, td3, md1, md2, md3, k)
    var h = 0.0
    var i = 0
    while (i < arr.length) { h += -arr(i); i += 1 }
    math.pow(2.0, h / words.length)
  }

  /** Per-token log2 probabilities under the same add-k bigram model as
    * [[LmUtil.perplexity]] (the SAME kernel — perplexity is 2^(-mean) of
    * this by construction, enforced by sharing [[lps]]). One double per
    * non-empty token, in token order; empty text returns an empty array.
    */
  def tokenLogProbs(
      text: UTF8String,
      unigrams: java.util.HashMap[String, java.lang.Long],
      bigrams: java.util.HashMap[String, java.lang.Long],
      vocabSize: Int,
      totalTokens: Long,
      k: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      lps(words, unigrams, bigrams, vocabSize, totalTokens, k))
  }
}

/** lm_token_logprobs(text) -> array<double>: the token-level scoring
  * surface (memorization / membership-inference audits aggregate it).
  */
case class LmTokenLogProbs(
    child: Expression,
    unigrams: java.util.HashMap[String, java.lang.Long],
    bigrams: java.util.HashMap[String, java.lang.Long],
    vocabSize: Int,
    totalTokens: Long,
    k: Double) extends UnaryExpression {
  require(vocabSize > 0 && totalTokens > 0 && k > 0,
    s"bad LM parameters: V=$vocabSize T=$totalTokens k=$k")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_token_logprobs"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LmUtil.tokenLogProbs(v.asInstanceOf[UTF8String], unigrams, bigrams,
      vocabSize, totalTokens, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val uni = ctx.addReferenceObj("lmUnigrams", unigrams, "java.util.HashMap")
      val bi = ctx.addReferenceObj("lmBigrams", bigrams, "java.util.HashMap")
      s"${ev.value} = graft.functions.LmUtil.tokenLogProbs($str, $uni, $bi, " +
        s"$vocabSize, ${totalTokens}L, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lm_kn_token_logprobs(text) -> array<double>: the KN token-level
  * scoring surface (the Min-K% audit's better-calibrated input).
  */
case class LmKnTokenLogProbs(
    child: Expression,
    bigrams: java.util.HashMap[String, java.lang.Long],
    histTotals: java.util.HashMap[String, java.lang.Long],
    histDistinct: java.util.HashMap[String, java.lang.Long],
    contCounts: java.util.HashMap[String, java.lang.Long],
    bTypes: Long,
    vocabSize: Int,
    d: Double,
    k: Double) extends UnaryExpression {
  require(vocabSize > 0 && bTypes > 0 && k > 0 && d > 0 && d < 1,
    s"bad KN parameters: V=$vocabSize B=$bTypes d=$d k=$k")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_kn_token_logprobs"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LmUtil.tokenLogProbsKn(v.asInstanceOf[UTF8String], bigrams, histTotals,
      histDistinct, contCounts, bTypes, vocabSize, d, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bi = ctx.addReferenceObj("knBigrams", bigrams, "java.util.HashMap")
      val ht = ctx.addReferenceObj("knHistTotals", histTotals, "java.util.HashMap")
      val hd = ctx.addReferenceObj("knHistDistinct", histDistinct, "java.util.HashMap")
      val cc = ctx.addReferenceObj("knContCounts", contCounts, "java.util.HashMap")
      s"${ev.value} = graft.functions.LmUtil.tokenLogProbsKn($str, $bi, $ht, " +
        s"$hd, $cc, ${bTypes}L, $vocabSize, $d, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lm_kn_perplexity(text) -> double: interpolated Kneser–Ney smoothing
  * against broadcast count tables (see [[LmUtil.perplexityKn]]).
  */
case class LmKnPerplexity(
    child: Expression,
    bigrams: java.util.HashMap[String, java.lang.Long],
    histTotals: java.util.HashMap[String, java.lang.Long],
    histDistinct: java.util.HashMap[String, java.lang.Long],
    contCounts: java.util.HashMap[String, java.lang.Long],
    bTypes: Long,
    vocabSize: Int,
    d: Double,
    k: Double) extends UnaryExpression {
  require(vocabSize > 0 && bTypes > 0 && k > 0 && d > 0 && d < 1,
    s"bad KN parameters: V=$vocabSize B=$bTypes d=$d k=$k")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_kn_perplexity"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LmUtil.perplexityKn(v.asInstanceOf[UTF8String], bigrams, histTotals,
      histDistinct, contCounts, bTypes, vocabSize, d, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bi = ctx.addReferenceObj("knBigrams", bigrams, "java.util.HashMap")
      val ht = ctx.addReferenceObj("knHistTotals", histTotals, "java.util.HashMap")
      val hd = ctx.addReferenceObj("knHistDistinct", histDistinct, "java.util.HashMap")
      val cc = ctx.addReferenceObj("knContCounts", contCounts, "java.util.HashMap")
      s"${ev.value} = graft.functions.LmUtil.perplexityKn($str, $bi, $ht, " +
        s"$hd, $cc, ${bTypes}L, $vocabSize, $d, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lm_kn3_perplexity(text) -> double: interpolated TRIGRAM Kneser–Ney
  * smoothing against broadcast count tables (see [[LmUtil.perplexityKn3]]).
  */
case class LmKn3Perplexity(
    child: Expression,
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
    k: Double) extends UnaryExpression {
  require(vocabSize > 0 && mTypes > 0 && k > 0 && d > 0 && d < 1,
    s"bad KN3 parameters: V=$vocabSize M=$mTypes d=$d k=$k")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_kn3_perplexity"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LmUtil.perplexityKn3(v.asInstanceOf[UTF8String], trigrams, triHistTotals,
      triHistDistinct, midCounts, midHistTotals, midHistDistinct, contCounts,
      mTypes, vocabSize, d, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val tg = ctx.addReferenceObj("kn3Trigrams", trigrams, "java.util.HashMap")
      val tht = ctx.addReferenceObj("kn3TriHistTotals", triHistTotals, "java.util.HashMap")
      val thd = ctx.addReferenceObj("kn3TriHistDistinct", triHistDistinct, "java.util.HashMap")
      val mc = ctx.addReferenceObj("kn3MidCounts", midCounts, "java.util.HashMap")
      val mht = ctx.addReferenceObj("kn3MidHistTotals", midHistTotals, "java.util.HashMap")
      val mhd = ctx.addReferenceObj("kn3MidHistDistinct", midHistDistinct, "java.util.HashMap")
      val cc = ctx.addReferenceObj("kn3ContCounts", contCounts, "java.util.HashMap")
      s"${ev.value} = graft.functions.LmUtil.perplexityKn3($str, $tg, $tht, " +
        s"$thd, $mc, $mht, $mhd, $cc, ${mTypes}L, $vocabSize, $d, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lm_perplexity(text) -> double, against broadcast count tables. */
case class LmPerplexity(
    child: Expression,
    unigrams: java.util.HashMap[String, java.lang.Long],
    bigrams: java.util.HashMap[String, java.lang.Long],
    vocabSize: Int,
    totalTokens: Long,
    k: Double) extends UnaryExpression {
  require(vocabSize > 0 && totalTokens > 0 && k > 0,
    s"bad LM parameters: V=$vocabSize T=$totalTokens k=$k")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_perplexity"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LmUtil.perplexity(v.asInstanceOf[UTF8String], unigrams, bigrams,
      vocabSize, totalTokens, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val uni = ctx.addReferenceObj("lmUnigrams", unigrams, "java.util.HashMap")
      val bi = ctx.addReferenceObj("lmBigrams", bigrams, "java.util.HashMap")
      s"${ev.value} = graft.functions.LmUtil.perplexity($str, $uni, $bi, " +
        s"$vocabSize, ${totalTokens}L, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lm_kn3_mod_perplexity(text) -> double: MODIFIED Kneser–Ney trigram
  * perplexity (Chen & Goodman 1998 estimated d1/d2/d3+ discounts, per-
  * history packed continuation buckets) — the production-KenLM upgrade of
  * [[LmKn3Perplexity]]. Same codegen'd shuffle-free scan shape.
  */
case class LmKn3ModPerplexity(
    child: Expression,
    trigrams: java.util.HashMap[String, java.lang.Long],
    triHistTotals: java.util.HashMap[String, java.lang.Long],
    triHistN: java.util.HashMap[String, java.lang.Long],
    midCounts: java.util.HashMap[String, java.lang.Long],
    midHistTotals: java.util.HashMap[String, java.lang.Long],
    midHistN: java.util.HashMap[String, java.lang.Long],
    contCounts: java.util.HashMap[String, java.lang.Long],
    mTypes: Long,
    vocabSize: Int,
    triD1: Double, triD2: Double, triD3: Double,
    midD1: Double, midD2: Double, midD3: Double,
    k: Double) extends UnaryExpression {
  require(vocabSize > 0 && mTypes > 0 && k > 0 &&
    triD1 > 0 && triD1 < 1 && triD2 > 0 && triD2 < 2 && triD3 > 0 && triD3 < 3 &&
    midD1 > 0 && midD1 < 1 && midD2 > 0 && midD2 < 2 && midD3 > 0 && midD3 < 3,
    s"bad modified-KN3 parameters: V=$vocabSize M=$mTypes k=$k " +
      s"tri=($triD1,$triD2,$triD3) mid=($midD1,$midD2,$midD3)")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lm_kn3_mod_perplexity"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    LmUtil.perplexityKn3Mod(v.asInstanceOf[UTF8String], trigrams,
      triHistTotals, triHistN, midCounts, midHistTotals, midHistN,
      contCounts, mTypes, vocabSize, triD1, triD2, triD3,
      midD1, midD2, midD3, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val tg = ctx.addReferenceObj("kn3mTrigrams", trigrams, "java.util.HashMap")
      val tht = ctx.addReferenceObj("kn3mTriHistTotals", triHistTotals, "java.util.HashMap")
      val thn = ctx.addReferenceObj("kn3mTriHistN", triHistN, "java.util.HashMap")
      val mc = ctx.addReferenceObj("kn3mMidCounts", midCounts, "java.util.HashMap")
      val mht = ctx.addReferenceObj("kn3mMidHistTotals", midHistTotals, "java.util.HashMap")
      val mhn = ctx.addReferenceObj("kn3mMidHistN", midHistN, "java.util.HashMap")
      val cc = ctx.addReferenceObj("kn3mContCounts", contCounts, "java.util.HashMap")
      s"${ev.value} = graft.functions.LmUtil.perplexityKn3Mod($str, $tg, " +
        s"$tht, $thn, $mc, $mht, $mhn, $cc, ${mTypes}L, $vocabSize, " +
        s"$triD1, $triD2, $triD3, $midD1, $midD2, $midD3, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

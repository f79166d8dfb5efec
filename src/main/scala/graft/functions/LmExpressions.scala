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

  /** Per-token average negative log2 likelihood -> perplexity 2^H.
    * First token scores against the unigram distribution; token i > 0
    * against P(w_i | w_{i-1}) = (c(bigram)+k) / (c(w_{i-1}) + k*V).
    * Unseen history backs off to the unigram estimate for the token.
    * Empty text scores perplexity = vocabSize + totalTokens upper bound?
    * No: defined as +Infinity-free — empty text returns 0.0 (no evidence).
    */
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

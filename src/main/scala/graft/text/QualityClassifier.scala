package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the CLASSIFIER stage of the published
  * curation recipes (GPT-3 trains a logistic classifier on hashed text
  * features with curated corpora as positives and raw crawl as negatives,
  * then keeps documents by a Pareto lottery over the score; Brown et al.
  * 2020, appendix A). Complements [[Curation.withCurationFlags]]' heuristic
  * gates: the heuristics are per-row codegen'd arithmetic, the classifier
  * LEARNS the boundary from reference corpora.
  *
  * Spark-first shape: training is the distributed Spark ML pipeline
  * (RegexTokenizer -> HashingTF -> LogisticRegression's parallel LBFGS);
  * scoring is one model.transform scan — no shuffle, executor-local
  * feature hashing against broadcast coefficients. The keep rule uses the
  * deterministic [[graft.operators.Curation.idHash]] lottery rather than a
  * runtime RNG, so the sampled corpus is REPRODUCIBLE across runs and
  * engines (same property as [[graft.operators.Curation.weightedSample]]).
  *
  * Reference analog: none (vector-only engine) — scale extension; the
  * algorithmic content (hashed-TF logistic quality classifier, Pareto
  * document lottery) is the published GPT-3/CCNet recipe.
  */
object QualityClassifier {

  /** A trained quality model (Spark ML pipeline: tokenize, hash, LR). */
  case class QualityModel(pipeline: PipelineModel)

  /** Train on reference corpora: `positives` = curated/high-quality docs,
    * `negatives` = raw crawl sample. `numFeatures` is the hashed feature
    * space (2^18 default — collisions average out in LR, the published
    * trade-off that keeps the feature map stateless and executor-local).
    */
  def train(
      positives: DataFrame,
      negatives: DataFrame,
      textCol: String,
      numFeatures: Int = 1 << 18,
      maxIter: Int = 20,
      regParam: Double = 1e-3): QualityModel = {
    val labeled = positives.select(col(textCol).as("_qc_text"))
      .withColumn("label", lit(1.0))
      .unionAll(negatives.select(col(textCol).as("_qc_text"))
        .withColumn("label", lit(0.0)))
    val tokenizer = new RegexTokenizer()
      .setInputCol("_qc_text").setOutputCol("_qc_toks")
      .setPattern("\\s+") // whitespace split: matches the engine's tokenizers
    val hashTf = new HashingTF()
      .setInputCol("_qc_toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val model = new Pipeline().setStages(Array(tokenizer, hashTf, lr))
      .fit(labeled)
    QualityModel(model)
  }

  /** Score every document: (idCol, quality_prob) with quality_prob =
    * P(high quality). One scan, no shuffle.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: QualityModel): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.pipeline
      .transform(docs.select(col(idCol), col(textCol).as("_qc_text")))
      .select(col(idCol),
        vector_to_array(col("probability")).getItem(1).as("quality_prob"))
  }

  /** Score with an EXPLICIT (token -> weight) table + intercept — the
    * linear-model seam: apply an externally trained linear text classifier
    * (a fastText-style export, or a hashed-TF model whose coefficients
    * were mapped back to vocabulary words) without the feature-hashing
    * layer, so the score is engine-portable and exactly replayable.
    * quality_prob = sigmoid(intercept + Σ over token OCCURRENCES of
    * weight(token)); tokens outside the table contribute 0 (they hash to
    * unpenalized features in the hashed model's terms). Scale shape: one
    * explode + broadcast weight join + per-doc sum — only (id, weight)
    * pairs shuffle, never text; docs with no weighted tokens score
    * sigmoid(intercept) via the left join.
    */
  def scoreLinear(
      docs: DataFrame, idCol: String, textCol: String,
      weights: Map[String, Double], intercept: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("_qc_w", "_qc_wt")
    val toks = docs.select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("_qc_w"))
      .filter(col("_qc_w") =!= "")
    val dots = toks.join(broadcast(wdf), Seq("_qc_w"))
      .groupBy(col(idCol)).agg(sum(col("_qc_wt")).as("_qc_dot"))
    docs.select(col(idCol)).join(dots, Seq(idCol), "left")
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("_qc_dot"), lit(0.0)) + lit(intercept)))))
          .as("quality_prob"))
  }

  /** The GPT-3 keep rule: document kept iff a Pareto(alpha) draw exceeds
    * (1 - score) — high scores almost always survive, low scores survive
    * occasionally (preserving tail diversity instead of a hard cutoff).
    * The draw is derived from the document id via the deterministic
    * idHash lottery (inverse-CDF: pareto = u^(-1/alpha) - 1), so the
    * decision is a pure filter — zero shuffle, reproducible, and stable
    * under alpha changes the way [[graft.operators.Curation
    * .weightedSample]] is under rate changes.
    */
  def paretoFilter(
      scored: DataFrame, idCol: String, alpha: Double = 9.0,
      probCol: String = "quality_prob"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val u = (graft.operators.Curation.idHash(col(idCol)).cast("double") + 0.5) /
      4294967296.0
    val pareto = pow(u, -1.0 / alpha) - 1.0
    scored.filter(pareto > lit(1.0) - col(probCol))
  }
}

package graft.functions

import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level API over the vector kernels, plus the canonical
  * score<->distance mapping.
  *
  * The reference ships three mutually inconsistent score/distance formulas
  * (api/routes/vectors.py:242-251 vs :303-308 vs
  * integrations/mlx_lm_pipeline.py:586-589). We canonicalize on the primary
  * single-query path (api/routes/vectors.py:242-251):
  *   cosine:    similarity = s,        distance = 1 - s
  *   euclidean: distance   = d,        similarity = 1 / (1 + d)
  *   dot:       similarity = s,        distance = -s
  */
object vector {

  val MetricCosine = "cosine"
  val MetricEuclidean = "euclidean"
  val MetricDot = "dot_product"
  val SupportedMetrics: Seq[String] = Seq(MetricCosine, MetricEuclidean, MetricDot)

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def euclidean_dist(a: Column, b: Column): Column =
    Bridge.column(EuclideanDistance(Bridge.expression(a), Bridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def vec_norm(a: Column): Column = Bridge.column(L2Norm(Bridge.expression(a)))

  def l2_normalize(a: Column): Column = Bridge.column(L2Normalize(Bridge.expression(a)))

  def l2_normalize(a: Column, eps: Double): Column =
    Bridge.column(L2Normalize(Bridge.expression(a), eps))

  /** similarity column for `metric`; higher is always better. */
  def similarity(vec: Column, query: Column, metric: String): Column = metric match {
    case MetricCosine    => cosine_sim(vec, query)
    case MetricEuclidean => lit(1.0) / (lit(1.0) + euclidean_dist(vec, query))
    case MetricDot       => dot_product(vec, query)
    case other => throw new IllegalArgumentException(
      s"unsupported metric '$other' (expected one of ${SupportedMetrics.mkString(", ")})")
  }

  /** canonical distance derived from the similarity column. */
  def distanceFromSimilarity(sim: Column, metric: String): Column = metric match {
    case MetricCosine    => lit(1.0) - sim
    case MetricEuclidean => lit(1.0) / sim - lit(1.0) // inverse of 1/(1+d)
    case MetricDot       => -sim
    case other => throw new IllegalArgumentException(s"unsupported metric '$other'")
  }

  /** Masked mean pooling over token embeddings (SURVEY §2.4 A4; reference
    * integrations/mlx_lm_pipeline.py:81-101): out[j] =
    * sum_i(emb[i][j] * mask[i]) / max(sum(mask), eps). Pure higher-order
    * functions — embs: array<array<float>>, mask: array<int>.
    */
  def maskedMeanPool(embs: Column, mask: Column, eps: Double = 1e-9): Column = {
    val dim = size(element_at(embs, 1))
    val zeros = transform(sequence(lit(1), dim), _ => lit(0.0d))
    val masked = zip_with(embs, mask, (e, m) =>
      transform(e, x => x.cast("double") * m.cast("double")))
    val summed = aggregate(masked, zeros, (acc, e) => zip_with(acc, e, _ + _))
    val denom = greatest(aggregate(mask,
      lit(0.0d), (a, m) => a + m.cast("double")), lit(eps))
    transform(summed, x => x / denom)
  }

  /** Register SQL names so `spark.sql("SELECT vec_cosine_sim(a,b) ...")` works. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "vec_cosine_sim", es => CosineSimilarity(es(0), es(1)))
    Bridge.registerFunction(spark, "vec_euclidean_dist", es => EuclideanDistance(es(0), es(1)))
    Bridge.registerFunction(spark, "vec_dot_product", es => DotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "vec_norm", es => L2Norm(es(0)))
    Bridge.registerFunction(spark, "vec_l2_normalize", es => L2Normalize(es(0)))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object HashEmbedUtil {
  /** Feature-hashing embedding: each token hashes to a bucket with a sign
    * bit; the bucket-count vector is L2-normalized. Deterministic, model-free
    * — the in-engine stand-in for the reference's MLX embedding forward pass
    * (integrations/mlx_lm_pipeline.py:247-321, which is out-of-engine model
    * inference in the Spark design; swap in a real model via the Embedder
    * trait).
    */
  def embed(tokens: ArrayData, dim: Int, seed: Long): ArrayData = {
    val acc = new Array[Double](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if (((h >>> 63) & 1L) == 1L) -1.0 else 1.0
      acc(bucket) += sign
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += acc(j) * acc(j); j += 1 }
    val inv = 1.0 / math.max(math.sqrt(norm), VectorOps.Eps)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    new GenericArrayData(out)
  }
}

/** hash_embed(tokens) -> array<float> of length `dim`, L2-normalized. */
case class HashEmbed(child: Expression, dim: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(dim >= 1 && dim <= 4096, s"dim out of range [1,4096]: $dim")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_embed"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashUtil.checkStringArray(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    HashEmbedUtil.embed(v.asInstanceOf[ArrayData], dim, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashEmbedUtil.embed($arr, $dim, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

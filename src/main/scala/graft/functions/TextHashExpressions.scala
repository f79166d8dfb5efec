package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels for near-duplicate detection (scale extensions beyond the
  * reference — SURVEY.md §7.1 step 8).
  *
  * Both are single-pass Catalyst expressions over an array<string> column
  * (token or shingle sets). ANSI mode makes long-multiply overflow throw in
  * SQL arithmetic, so the classic (a*h + b) MinHash permutations live here in
  * Java-wrapping arithmetic instead of Column math.
  */
object TextHashUtil {

  /** Deterministic permutation constants for a given seed. */
  def permConstants(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L) // odd => bijective mod 2^64
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  /** MinHash signature of a string array: out[i] = min over elements of
    * (a_i * xxh64(elem, seed) + b_i), wrapping arithmetic.
    */
  def minhash(arr: ArrayData, a: Array[Long], b: Array[Long], seed: Long): ArrayData = {
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      var i = 0
      while (i < k) {
        val v = a(i) * base + b(i)
        if (v < out(i)) out(i) = v
        i += 1
      }
      e += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a string array: per-element xxh64, sum +1/-1 per bit,
    * sign of each bit-count forms the fingerprint.
    */
  def simhash(arr: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      e += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  private[functions] def checkStringArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string>, got ${other.simpleString}")
    }
}

/** minhash_signature(shingles) -> array<bigint> of length numHashes. */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 1024, s"numHashes out of range: $numHashes")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashUtil.checkStringArray(child.dataType, prettyName)

  @transient private lazy val (aConsts, bConsts) =
    TextHashUtil.permConstants(numHashes, seed)

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.minhash(v.asInstanceOf[ArrayData], aConsts, bConsts, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", aConsts, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bConsts, "long[]")
      s"${ev.value} = graft.functions.TextHashUtil.minhash($arr, $aRef, $bRef, ${seed}L);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(tokens) -> bigint fingerprint. */
case class SimHash64(child: Expression, seed: Long = 42L) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashUtil.checkStringArray(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    TextHashUtil.simhash(v.asInstanceOf[ArrayData], seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TextHashUtil.simhash($arr, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

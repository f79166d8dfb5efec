package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels: subspace code assignment and asymmetric
  * distance computation (ADC). Both are single-pass Catalyst expressions
  * with `doGenCode`, so PQ scoring stays inside whole-stage codegen like
  * the other similarity kernels.
  *
  * Arithmetic is fully ordered for engine reproducibility (the q44/q46
  * oracle discipline): squared-L2 accumulates dimension-ascending in
  * doubles (float inputs widen exactly), code argmin scans codebook-entry-
  * ascending with strict `<` (ties keep the LOWEST entry), and ADC sums
  * subspace-ascending.
  */
object PqUtil {

  /** Assign one code per subspace: codes[m] = argmin_k sumsq(vec_sub_m -
    * codebook[m][k]). `flat` is the codebook flattened [m][k][j] row-major.
    */
  def encode(
      vec: ArrayData, flat: Array[Double], m: Int, k: Int, subDim: Int,
      floatElems: Boolean): ArrayData = {
    require(vec.numElements() == m * subDim,
      s"vector has ${vec.numElements()} dims, expected ${m * subDim}")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = if (floatElems) vec.getFloat(mi * subDim + j).toDouble
            else vec.getDouble(mi * subDim + j)
          val diff = x - flat(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = ki } // strict <: lowest k wins ties
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC score for one (codes row, query) pair: sum over subspaces of the
    * query's precomputed distance-to-centroid table. `tables` is flattened
    * [query][m][k] row-major.
    */
  def adc(codes: ArrayData, tables: Array[Double], qIdx: Int, m: Int, k: Int): Double = {
    require(codes.numElements() == m, s"${codes.numElements()} codes, expected $m")
    val base = qIdx * m * k
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += tables(base + mi * k + codes.getInt(mi))
      mi += 1
    }
    s
  }
}

/** pq_encode(vec) -> array<int> of length numSubspaces. */
case class PqEncode(
    child: Expression, flat: Array[Double], numSubspaces: Int, codebookSize: Int,
    subDim: Int) extends UnaryExpression {
  require(flat.length == numSubspaces * codebookSize * subDim,
    s"codebook size ${flat.length} != $numSubspaces*$codebookSize*$subDim")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PqUtil.encode(v.asInstanceOf[ArrayData], flat, numSubspaces, codebookSize,
      subDim, floatElems)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      s"${ev.value} = graft.functions.PqUtil.encode($arr, $ref, " +
        s"$numSubspaces, $codebookSize, $subDim, $floatElems);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(codes, query_index) -> double: asymmetric distance of a coded row
  * to the query_index-th query, via that query's precomputed tables.
  */
case class PqAdcScore(
    left: Expression, right: Expression, tables: Array[Double],
    numSubspaces: Int, codebookSize: Int) extends BinaryExpression {
  require(tables.length % (numSubspaces * codebookSize) == 0,
    s"tables length ${tables.length} not a multiple of $numSubspaces*$codebookSize")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(codes: Any, qIdx: Any): Any =
    PqUtil.adc(codes.asInstanceOf[ArrayData], tables, qIdx.asInstanceOf[Int],
      numSubspaces, codebookSize)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qIdx) => {
      val ref = ctx.addReferenceObj("pqTables", tables, "double[]")
      s"${ev.value} = graft.functions.PqUtil.adc($codes, $ref, $qIdx, " +
        s"$numSubspaces, $codebookSize);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst expressions for the reference engine's compute kernels.
  *
  * Semantics locked to the reference (see SURVEY.md §2.8):
  *  - cosine:    normalize both sides by L2 norm clamped to eps=1e-8, then dot
  *               (reference: service/optimized_vector_store.py:31-41)
  *  - euclidean: sqrt(sum((a-b)^2))  (service/optimized_vector_store.py:43-48)
  *  - dot:       raw unnormalized inner product (performance/mlx_optimized.py:150-156)
  *  - l2normalize: v / max(||v||2, eps); eps=1e-8 store-side, 1e-12 for the
  *               embedding pipeline variant (performance/mlx_optimized.py:110-125,
  *               integrations/mlx_lm_pipeline.py:103-108)
  *
  * All math is done in double precision regardless of the input element type
  * (float32 columns are the common case). Whole-stage codegen is implemented
  * for every expression so the similarity kernels stay inside Tungsten's
  * generated loop — no UDF/serialization overhead in the hot path.
  */
object VectorOps {
  val Eps: Double = 1e-8

  def supportedElem(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | IntegerType | LongType | ShortType => true
    case _ => false
  }

  /** Row-access closure for an array element, widened to double. */
  def getter(et: DataType): (ArrayData, Int) => Double = et match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case ShortType   => (a, i) => a.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }

  /** Java source for reading element `i` of ArrayData `arr` as a double. */
  def accessCode(et: DataType, arr: String, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }
}

/** Common scaffolding for binary array->double kernels. */
abstract class VectorBinaryKernel extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if VectorOps.supportedElem(lt) && VectorOps.supportedElem(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<numeric> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient protected lazy val leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient protected lazy val rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType
  @transient protected lazy val getL: (ArrayData, Int) => Double = VectorOps.getter(leftElem)
  @transient protected lazy val getR: (ArrayData, Int) => Double = VectorOps.getter(rightElem)
}

/** cosine_sim(a, b) = dot(a,b) / (max(||a||,eps) * max(||b||,eps)). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "vec_cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.max(math.sqrt(na), VectorOps.Eps) * math.max(math.sqrt(nb), VectorOps.Eps))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${VectorOps.accessCode(leftElem, a, i)};
         |  double $y = ${VectorOps.accessCode(rightElem, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.max(java.lang.Math.sqrt($na), ${VectorOps.Eps})
         |    * java.lang.Math.max(java.lang.Math.sqrt($nb), ${VectorOps.Eps}));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** euclidean_dist(a, b) = sqrt(sum((a_i - b_i)^2)). */
case class EuclideanDistance(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "vec_euclidean_dist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = getL(a, i) - getR(b, i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${VectorOps.accessCode(leftElem, a, i)} - ${VectorOps.accessCode(rightElem, b, i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_product(a, b) = raw inner product, no normalization. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryKernel {
  override def prettyName: String = "vec_dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += getL(a, i) * getR(b, i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${VectorOps.accessCode(leftElem, a, i)}) * (${VectorOps.accessCode(rightElem, b, i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_norm(a) = sqrt(sum(a_i^2)). */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if VectorOps.supportedElem(et) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<numeric> argument, got ${child.dataType.simpleString}")
  }

  @transient private lazy val elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val get: (ArrayData, Int) => Double = VectorOps.getter(elem)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val x = get(a, i); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${VectorOps.accessCode(elem, a, i)};
         |  $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** l2_normalize(a, eps) = a / max(||a||2, eps), emitted as array<double>.
  *
  * eps defaults to the store-side 1e-8; the reference's embedding pipeline
  * uses 1e-12 (integrations/mlx_lm_pipeline.py:103-108) — pass it explicitly
  * for that path.
  */
case class L2Normalize(child: Expression, eps: Double = VectorOps.Eps) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if VectorOps.supportedElem(et) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<numeric> argument, got ${child.dataType.simpleString}")
  }

  @transient private lazy val elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val get: (ArrayData, Int) => Double = VectorOps.getter(elem)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0; var i = 0
    while (i < n) { val x = get(a, i); out(i) = x; acc += x * x; i += 1 }
    val inv = 1.0 / math.max(math.sqrt(acc), eps)
    i = 0
    while (i < n) { out(i) *= inv; i += 1 }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val inv = ctx.freshName("inv")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = ${VectorOps.accessCode(elem, a, i)};
         |  $acc += $out[$i] * $out[$i];
         |}
         |double $inv = 1.0 / java.lang.Math.max(java.lang.Math.sqrt($acc), $eps);
         |for (int $i = 0; $i < $n; $i++) { $out[$i] *= $inv; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Kernels backing the ANN scale path (SURVEY.md §7.1 step 7): IVF coarse
  * quantization and random-hyperplane LSH for embedding near-dup.
  * Single-pass Java loops, codegen'd via static helpers.
  */
object AnnUtil {

  /** Ids of the `nProbe` nearest centroids, best first.
    * metric: "cosine" (max normalized dot) or "euclidean" (min distance).
    */
  def nearestCentroids(
      vec: ArrayData,
      centroids: Array[Array[Double]],
      metric: String,
      nProbe: Int,
      floatElems: Boolean): ArrayData = {
    val n = centroids.length
    val scores = new Array[Double](n)
    val cosine = metric == "cosine"
    var c = 0
    while (c < n) {
      scores(c) = if (cosine) -cosineScore(vec, centroids(c), floatElems)
      else eucl2(vec, centroids(c), floatElems)
      c += 1
    }
    // partial selection of the nProbe smallest scores; exact score ties
    // break to the LOWER centroid id (compare (score, id) pairs) so probe
    // order matches the oracle's `ORDER BY score, list_id ASC` contract —
    // plain `<` on scores alone can emit tied centroids out of id order
    // after earlier swaps shuffled idx
    val idx = Array.tabulate(n)(identity)
    val take = math.min(nProbe, n)
    var i = 0
    while (i < take) {
      var best = i
      var j = i + 1
      while (j < n) {
        val sj = scores(idx(j)); val sb = scores(idx(best))
        if (sj < sb || (sj == sb && idx(j) < idx(best))) best = j
        j += 1
      }
      val tmp = idx(i); idx(i) = idx(best); idx(best) = tmp
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(idx, 0, take))
  }

  private def cosineScore(vec: ArrayData, c: Array[Double], floatElems: Boolean): Double = {
    val n = math.min(vec.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var i = 0
    while (i < n) {
      val x = if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)
      dot += x * c(i); na += x * x
      i += 1
    }
    // centroids are pre-normalized at build time for the cosine metric
    dot / math.max(math.sqrt(na), VectorOps.Eps)
  }

  private def eucl2(vec: ArrayData, c: Array[Double], floatElems: Boolean): Double = {
    val n = math.min(vec.numElements(), c.length)
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = (if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)) - c(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Sign-bit signature of `vec` against up to 64 random hyperplanes. */
  def hyperplaneSig(vec: ArrayData, planes: Array[Array[Double]], floatElems: Boolean): Long = {
    var out = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(vec.numElements(), plane.length)
      var dot = 0.0; var i = 0
      while (i < n) {
        dot += (if (floatElems) vec.getFloat(i).toDouble else vec.getDouble(i)) * plane(i)
        i += 1
      }
      if (dot > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Deterministic gaussian hyperplanes (<= 64: one signature word). */
  def randomPlanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    require(nBits <= 64, s"nBits must be in [1,64], got $nBits")
    randomPlanesWide(nBits, dim, seed)
  }

  /** [[randomPlanes]] without the one-word cap — wide signatures span
    * ceil(nBits/64) longs ([[graft.operators.HyperplaneIndex]] slices this
    * per word). Same stream: the first 64 planes equal randomPlanes's.
    */
  def randomPlanesWide(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    require(nBits >= 1, s"nBits must be >= 1, got $nBits")
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Solve the square system `a x = b` by Gauss-Jordan with partial
    * pivoting (`a` is copied; 64x64 is the intended size — the hyperplane
    * geometry's plane matrix). Throws on a singular matrix.
    */
  def solveLinear(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = a.length
    require(n >= 1 && a.forall(_.length == n) && b.length == n,
      s"solveLinear needs a square n x n system, got ${a.length} rows")
    val m = Array.tabulate(n)(i => a(i).clone())
    val x = b.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      require(math.abs(m(piv)(col)) > 0.0, s"singular plane matrix at column $col")
      if (piv != col) {
        val tr = m(piv); m(piv) = m(col); m(col) = tr
        val tb = x(piv); x(piv) = x(col); x(col) = tb
      }
      val d = m(col)(col)
      var j = col; while (j < n) { m(col)(j) /= d; j += 1 }
      x(col) /= d
      r = 0
      while (r < n) {
        if (r != col && m(r)(col) != 0.0) {
          val f = m(r)(col)
          j = col; while (j < n) { m(r)(j) -= f * m(col)(j); j += 1 }
          x(r) -= f * x(col)
        }
        r += 1
      }
      col += 1
    }
    x
  }

  /** A vector whose hyperplane signature differs from `vec`'s in EXACTLY
    * `flipBits` — the deterministic multi-probe test construction: with
    * nBits == dim the plane matrix is square (generically invertible), so
    * every dot product is controllable. Each target dot is set to the
    * sign-flipped side and every other dot to its original side, all at
    * magnitude >= `marginFrac * ||vec||` — the margin makes the signature
    * robust to the solve's roundoff AND the float32 round-trip a stored
    * embedding column imposes (both orders of magnitude below 1e-3).
    * The returned vector is NOT close to `vec` in general; pair it with a
    * vacuous verify threshold when testing candidate recall in isolation.
    */
  def signatureJitter(
      planes: Array[Array[Double]],
      vec: Array[Double],
      flipBits: Set[Int],
      marginFrac: Double = 1e-3): Array[Double] = {
    val n = planes.length
    require(vec.length == n, s"signatureJitter needs nBits == dim, got " +
      s"nBits=$n dim=${vec.length}")
    require(flipBits.forall(b => b >= 0 && b < n), s"flipBits out of [0,$n)")
    val norm = math.sqrt(vec.map(x => x * x).sum)
    val margin = marginFrac * math.max(norm, 1e-12)
    val t = Array.tabulate(n) { k =>
      var dot = 0.0; var i = 0
      while (i < vec.length) { dot += planes(k)(i) * vec(i); i += 1 }
      // the signature convention is (dot > 0); dot == 0 reads as bit 0, so
      // the "keep the bit" side for a zero dot is the strictly-negative one
      val bit = dot > 0
      val want = if (flipBits.contains(k)) !bit else bit
      (if (want) 1.0 else -1.0) * math.max(math.abs(dot), margin)
    }
    solveLinear(planes, t)
  }
}

private[functions] trait VecArrayCheck extends Expression {
  def childDataType: DataType
  override def checkInputDataTypes(): TypeCheckResult = childDataType match {
    case ArrayType(et, _) if VectorOps.supportedElem(et) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<numeric>, got ${other.simpleString}")
  }
}

/** centroid_probes(vec) -> array<int> of the nProbe nearest centroid ids. */
case class CentroidProbes(
    child: Expression,
    centroids: Array[Array[Double]],
    metric: String,
    nProbe: Int) extends UnaryExpression with VecArrayCheck {
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_probes"
  override def childDataType: DataType = child.dataType
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    AnnUtil.nearestCentroids(v.asInstanceOf[ArrayData], centroids, metric, nProbe, floatElems)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"""${ev.value} = graft.functions.AnnUtil.nearestCentroids($arr, $cRef, "$metric", $nProbe, $floatElems);"""
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hyperplane_sig(vec) -> bigint LSH signature (random-hyperplane simhash). */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with VecArrayCheck {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"
  override def childDataType: DataType = child.dataType
  override def dataType: DataType = LongType

  @transient private lazy val floatElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    AnnUtil.hyperplaneSig(v.asInstanceOf[ArrayData], planes, floatElems)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
      s"${ev.value} = graft.functions.AnnUtil.hyperplaneSig($arr, $pRef, $floatElems);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

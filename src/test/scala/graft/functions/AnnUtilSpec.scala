package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The multi-probe test construction's math: a 64x64 Gauss-Jordan solve
  * and the exact-signature jitter built on it (q77's contract hinges on
  * the jitter flipping EXACTLY the requested bits, robust to roundoff and
  * the float32 round-trip a stored embedding column imposes).
  */
class AnnUtilSpec extends AnyFunSuite {

  private def dot(p: Array[Double], v: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += p(i) * v(i); i += 1 }
    acc
  }

  /** The HyperplaneSignature convention: bit k set iff dot > 0. */
  private def sig(planes: Array[Array[Double]], v: Array[Double]): Long =
    planes.indices.foldLeft(0L)((s, k) =>
      if (dot(planes(k), v) > 0) s | (1L << k) else s)

  test("solveLinear recovers the planted solution of a 64x64 system") {
    val rnd = new java.util.Random(7)
    val n = 64
    val a = Array.fill(n)(Array.fill(n)(rnd.nextGaussian()))
    val x = Array.fill(n)(rnd.nextGaussian())
    val b = Array.tabulate(n)(i => dot(a(i), x))
    val got = AnnUtil.solveLinear(a, b)
    (0 until n).foreach(i =>
      assert(math.abs(got(i) - x(i)) < 1e-9, s"component $i off"))
  }

  test("solveLinear rejects singular and non-square systems") {
    val singular = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    intercept[IllegalArgumentException](
      AnnUtil.solveLinear(singular, Array(1.0, 1.0)))
    intercept[IllegalArgumentException](
      AnnUtil.solveLinear(Array(Array(1.0, 2.0)), Array(1.0)))
  }

  test("signatureJitter flips exactly the requested bits") {
    val planes = AnnUtil.randomPlanesWide(64, 64, 42L)
    val rnd = new java.util.Random(3)
    (0 until 20).foreach { trial =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val flips = Set(0, 32, rnd.nextInt(64), rnd.nextInt(64))
      val j = AnnUtil.signatureJitter(planes, v, flips)
      val mask = flips.foldLeft(0L)((m, b) => m | (1L << b))
      assert((sig(planes, j) ^ sig(planes, v)) == mask,
        s"trial $trial: wrong bits changed (flips=$flips)")
    }
  }

  test("signatureJitter's margin survives the float32 round-trip") {
    // a stored embedding column is float32: casting the jittered vector
    // down and back must not move any dot across zero
    val planes = AnnUtil.randomPlanesWide(64, 64, 42L)
    val rnd = new java.util.Random(11)
    (0 until 20).foreach { trial =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val j = AnnUtil.signatureJitter(planes, v, Set(0, 32))
      val f32 = j.map(x => x.toFloat.toDouble)
      assert(sig(planes, f32) == sig(planes, j),
        s"trial $trial: float32 rounding moved a signature bit")
    }
  }

  test("signatureJitter guards its preconditions") {
    val planes = AnnUtil.randomPlanesWide(64, 64, 42L)
    intercept[IllegalArgumentException](
      AnnUtil.signatureJitter(planes, Array.fill(32)(1.0), Set(0)))
    intercept[IllegalArgumentException](
      AnnUtil.signatureJitter(planes, Array.fill(64)(1.0), Set(64)))
  }
}

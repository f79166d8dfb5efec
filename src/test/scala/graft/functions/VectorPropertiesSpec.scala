package graft.functions

import graft.SparkSpec
import graft.operators.Knn
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the similarity kernels and top-k semantics
  * (SURVEY.md §5 implication: ScalaCheck invariants the reference never had).
  * Properties are evaluated THROUGH Spark (collected via a local DataFrame),
  * so they exercise the same eval/codegen paths production uses.
  */
class VectorPropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // deterministic sampling from ScalaCheck generators (no scalatest bridge
  // in the offline cache)
  private def samples[T](g: Gen[T], n: Int, seed: Long = 7L): Seq[T] =
    (0 until 4 * n).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .take(n).toSeq

  private val vecGen: Gen[List[Float]] =
    Gen.choose(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100f, 100f).suchThat(f => !f.isNaN)))

  private def evalPair(a: Seq[Float], b: Seq[Float], f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f($"a", $"b").cast("double")).head().getDouble(0)

  test("property: cosine is symmetric and bounded in [-1-eps, 1+eps]") {
    samples(Gen.zip(vecGen, vecGen), 30).foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      val ab = evalPair(x, y, vector.cosine_sim)
      val ba = evalPair(y, x, vector.cosine_sim)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("property: cosine self-similarity is 1 for non-zero vectors") {
    samples(vecGen.suchThat(v => v.exists(x => math.abs(x) > 0.01)), 30).foreach { v =>
      assert(math.abs(evalPair(v, v, vector.cosine_sim) - 1.0) < 1e-9)
    }
  }

  test("property: euclidean is symmetric, non-negative, zero iff identical") {
    samples(Gen.zip(vecGen, vecGen), 30).foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      val d = evalPair(x, y, vector.euclidean_dist)
      assert(d >= 0.0)
      assert(math.abs(d - evalPair(y, x, vector.euclidean_dist)) < 1e-12)
      if (x == y) assert(d < 1e-6)
    }
    // explicit identical-pair case (zip rarely generates equal vectors)
    samples(vecGen, 10).foreach { v =>
      assert(evalPair(v, v, vector.euclidean_dist) < 1e-6)
    }
  }

  test("property: l2_normalize output has unit norm (or zero for zero input)") {
    samples(vecGen, 30).foreach { v =>
      val n = Seq(Tuple1(v)).toDF("a")
        .select(vector.vec_norm(vector.l2_normalize($"a"))).head().getDouble(0)
      if (v.exists(_ != 0f)) assert(math.abs(n - 1.0) < 1e-6) else assert(n < 1e-6)
    }
  }

  test("property: top-k scores are monotone non-increasing and k-bounded") {
    val rnd = new scala.util.Random(11)
    val store = (0 until 60).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vector").cache()
    samples(Gen.choose(1, 20), 10).foreach { k =>
      val q = Seq.fill(8)(rnd.nextDouble())
      val rows = Knn.topK(store, q, k).collect()
      assert(rows.length == math.min(k, 60))
      val scores = rows.map(_.getAs[Double]("similarity_score"))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("property: filter-then-rank == rank-then-filter on flat index") {
    // SURVEY §5: on an exact (flat) scan, pre-filtering commutes with ranking
    val rnd = new scala.util.Random(13)
    val store = (0 until 50).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat()), Map("p" -> (i % 2).toString))
    }.toDF("id", "vector", "meta").cache()
    val q = Seq.fill(8)(rnd.nextDouble())
    val direct = Knn.topK(store, q, 50, metadataFilter = Map("p" -> "1"))
      .select($"id").collect().map(_.getLong(0)).toSeq
    val post = Knn.topK(store, q, 50)
      .filter($"meta"("p") === "1")
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(direct == post)
  }
}

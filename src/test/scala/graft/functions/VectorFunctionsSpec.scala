package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md F4 — exact-value similarity oracle on hand-computable vectors. */
class VectorFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Tol = 1e-9

  private def pair(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  private def evalD(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Double =
    df.select(c.cast("double")).head().getDouble(0)

  test("orthogonal vectors: cosine 0, euclidean sqrt(2), dot 0") {
    val df = pair(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))
    assert(math.abs(evalD(df, vector.cosine_sim($"a", $"b"))) < Tol)
    assert(math.abs(evalD(df, vector.euclidean_dist($"a", $"b")) - math.sqrt(2)) < Tol)
    assert(math.abs(evalD(df, vector.dot_product($"a", $"b"))) < Tol)
  }

  test("identical vectors: cosine 1, euclidean 0, dot 2") {
    val df = pair(Seq(1f, 1f, 0f), Seq(1f, 1f, 0f))
    assert(math.abs(evalD(df, vector.cosine_sim($"a", $"b")) - 1.0) < Tol)
    assert(math.abs(evalD(df, vector.euclidean_dist($"a", $"b"))) < Tol)
    assert(math.abs(evalD(df, vector.dot_product($"a", $"b")) - 2.0) < Tol)
  }

  test("scale invariance of cosine; dot is 18") {
    val df = pair(Seq(1f, 2f, 2f), Seq(2f, 4f, 4f))
    assert(math.abs(evalD(df, vector.cosine_sim($"a", $"b")) - 1.0) < 1e-7)
    assert(math.abs(evalD(df, vector.dot_product($"a", $"b")) - 18.0) < Tol)
  }

  test("zero vector: cosine defined via eps clamp, no NaN") {
    val df = pair(Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))
    val c = evalD(df, vector.cosine_sim($"a", $"b"))
    assert(!c.isNaN && math.abs(c) < Tol)
  }

  test("l2_normalize produces unit vector; zero vector stays finite") {
    val df = pair(Seq(3f, 4f, 0f), Seq(0f, 0f, 0f))
    val n = evalD(df, vector.vec_norm(vector.l2_normalize($"a")))
    assert(math.abs(n - 1.0) < Tol)
    val zn = evalD(df, vector.vec_norm(vector.l2_normalize($"b")))
    assert(!zn.isNaN && math.abs(zn) < Tol)
  }

  test("null input yields null, not a crash") {
    val df = Seq((Some(Seq(1f, 0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(vector.cosine_sim($"a", $"b")).head().isNullAt(0))
  }

  test("works on double arrays and mixed float/double") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.5f, 0.5f))).toDF("a", "b")
    val c = evalD(df, vector.cosine_sim($"a", $"b"))
    assert(math.abs(c - math.cos(math.Pi / 4)) < 1e-7)
  }

  test("SQL registration: vec_cosine_sim usable from spark.sql") {
    vector.register(spark)
    pair(Seq(1f, 0f), Seq(1f, 0f)).createOrReplaceTempView("vf_pairs")
    val r = spark.sql("SELECT vec_cosine_sim(a, b) AS s FROM vf_pairs").head().getDouble(0)
    assert(math.abs(r - 1.0) < Tol)
  }

  test("expressions survive codegen (no CodegenFallback in plan)") {
    // non-foldable input (derived from range id) so the optimizer can't
    // constant-fold the kernel away before physical planning
    val df = spark.range(4)
      .select(
        array($"id".cast("float"), lit(2f)).as("a"),
        array(lit(3f), $"id".cast("float")).as("b"))
      .select(vector.cosine_sim($"a", $"b").as("c"))
    // the "*(n)" prefix marks a WholeStageCodegen stage in the simple plan string
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project"), s"expected whole-stage codegen in:\n$plan")
    // and the generated code must actually run
    assert(df.count() == 4)
  }

  test("property: cosine self-similarity == 1 for non-zero vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Seq.fill(16)(rnd.nextFloat() + 0.01f))
    val df = vecs.map(v => (v, v)).toDF("a", "b")
    val bad = df.select(vector.cosine_sim($"a", $"b").as("c"))
      .filter(abs($"c" - 1.0) > 1e-6).count()
    assert(bad == 0)
  }
}

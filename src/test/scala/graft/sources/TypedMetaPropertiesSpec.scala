package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property lock: TypedMeta.typedEquals over TypedMeta.metaColumn encoding
  * behaves exactly like Python `==` on the (stored, filter) value pair —
  * for ALL supported type combinations, not just the demo corpus.
  */
class TypedMetaPropertiesSpec extends AnyFunSuite with SparkSpec {

  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-3, 3).map(_.asInstanceOf[Any]),                 // small ints (collisions likely)
    Gen.chooseNum(-3L, 3L).map(_.asInstanceOf[Any]),               // longs
    Gen.oneOf(-1.0, 0.0, 0.5, 1.0, 2.0, 2.5).map(_.asInstanceOf[Any]), // doubles
    Gen.oneOf(true, false).map(_.asInstanceOf[Any]),
    Gen.oneOf("0", "1", "true", "false", "a", "0.5", "", "x\ty\nz", "q\"w\\e")
      .map(_.asInstanceOf[Any]))

  /** Python `==` on the supported scalar domain (bool is an int; strings
    * only equal strings).
    */
  private def pythonEq(a: Any, b: Any): Boolean = {
    def num(x: Any): Option[Double] = x match {
      case b: Boolean => Some(if (b) 1.0 else 0.0)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case d: Double => Some(d)
      case _ => None
    }
    (a, b) match {
      case (x: String, y: String) => x == y
      case _ => (num(a), num(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ => false
      }
    }
  }

  test("typedEquals == Python equality for all stored/filter type pairs") {
    import spark.implicits._
    val pairs = {
      val seed = org.scalacheck.rng.Seed(42L)
      val params = Gen.Parameters.default
      Iterator.iterate(seed)(_.next)
        .take(120)
        .flatMap(s => Gen.zip(genValue, genValue).apply(params, s))
        .toVector
    }
    assert(pairs.size >= 100, s"generator should produce enough samples, got ${pairs.size}")

    // one row, one meta key per pair, every predicate evaluated in ONE pass
    val metaFields = pairs.zipWithIndex.map { case ((stored, _), i) =>
      val c = stored match {
        case v: Int => lit(v)
        case v: Long => lit(v)
        case v: Double => lit(v)
        case v: Boolean => lit(v)
        case v: String => lit(v)
      }
      s"k$i" -> c
    }
    val df = Seq(1).toDF("one")
      .select(TypedMeta.metaColumn(metaFields: _*).as("meta"))
    val predicates = pairs.zipWithIndex.map { case ((_, filter), i) =>
      TypedMeta.typedEquals(col("meta"), s"k$i", filter).as(s"p$i")
    }
    val row = df.select(predicates: _*).head()

    pairs.zipWithIndex.foreach { case ((stored, filter), i) =>
      val got = !row.isNullAt(i) && row.getBoolean(i)
      val want = pythonEq(stored, filter)
      assert(got == want,
        s"stored=$stored (${stored.getClass.getSimpleName}) " +
          s"filter=$filter (${filter.getClass.getSimpleName}): got $got, want $want")
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class HeavyHittersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def naive(items: Seq[String], minFrac: Double): Map[String, Long] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c.toDouble > minFrac * n.toDouble }.toMap
  }

  private def run(items: Seq[String], minFrac: Double, sketchSize: Int = 0,
      parts: Int = 7): Map[String, Long] =
    HeavyHitters.heavyHitters(
      items.toDF("x").repartition(parts), col("x"), minFrac, sketchSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact vs naive when the sketch is far smaller than the vocabulary") {
    // 5000 singletons + two genuinely heavy items: vocab 5002, sketch 25
    val items = (1 to 5000).map(i => s"tail$i") ++
      Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2")
    val minFrac = 0.04 // n=5800 -> threshold 232: hot1 and hot2 pass
    val got = run(Random.shuffle(items), minFrac)
    assert(got == naive(items, minFrac))
    assert(got == Map("hot1" -> 500L, "hot2" -> 300L))
  }

  test("exact vs naive on a seeded Zipf stream across partitionings") {
    val rnd = new Random(42)
    // Zipf-ish: item i appears with weight 1/i over a 400-item universe
    val weights = (1 to 400).map(i => 1.0 / i)
    val total = weights.sum
    val items = Seq.fill(20000) {
      var u = rnd.nextDouble() * total
      var i = 0
      while (u > weights(i)) { u -= weights(i); i += 1 }
      s"z$i"
    }
    val expect = naive(items, 0.005)
    assert(expect.nonEmpty && expect.size < 60) // the test means something
    for (parts <- Seq(1, 4, 13)) {
      assert(run(items, 0.005, parts = parts) == expect, s"parts=$parts")
    }
  }

  test("boundary counts: strictly-greater threshold, ties excluded") {
    // n=100; minFrac=0.2 -> threshold 20.0: a count of exactly 20 must NOT pass
    val items = Seq.fill(20)("at") ++ Seq.fill(21)("above") ++
      (1 to 59).map(i => s"t$i")
    val got = run(items, 0.2)
    assert(got == Map("above" -> 21L))
  }

  test("oversized sketch changes nothing; undersized sketch is rejected") {
    val items = Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ (1 to 60).map(i => s"t$i")
    assert(run(items, 0.25, sketchSize = 1000) == Map("a" -> 30L))
    val ex = intercept[IllegalArgumentException] {
      run(items, 0.01, sketchSize = 5)
    }
    assert(ex.getMessage.contains("cannot guarantee recall"))
  }

  test("nulls are dropped from both the count base and the candidates") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("x")
    val got = HeavyHitters.heavyHitters(df, col("x"), 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 4 non-null; threshold 2.0: a(3) passes, b(1) does not
    assert(got == Map("a" -> 3L))
  }

  test("empty input yields an empty (item, cnt) frame") {
    val out = HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("x"), col("x"), 0.1)
    assert(out.columns.toSeq == Seq("item", "cnt"))
    assert(out.count() == 0L)
  }

  test("MisraGriesAggregator never loses an item above n/(k+1)") {
    // direct unit check of the summary guarantee, merge path included
    val k = 10
    val agg = new HeavyHitters.MisraGriesAggregator(k)
    val rnd = new Random(7)
    val stream = Seq.fill(3000)(rnd.nextInt(500).toLong) ++
      Seq.fill(400)(9999L) // 400 > 3400/11 = 309.1
    val chunks = rnd.shuffle(stream).grouped(137).toSeq
    val merged = chunks.map { ch =>
      ch.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    }.reduce((a, b) => agg.merge(a, b))
    assert(agg.finish(merged).contains(9999L))
  }
}

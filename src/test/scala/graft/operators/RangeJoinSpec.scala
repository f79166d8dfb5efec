package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin: bucket-and-verify equals the brute-force predicate exactly
  * (including bucket edges, the inclusive boundary, and negative values),
  * emits no duplicates, and plans without a Cartesian term.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // values deliberately straddle 0 and land ON bucket edges (multiples of
  // the delta) so floor-division semantics are exercised both sides of zero
  private lazy val data = (0 until 300).map { i =>
    (i % 5, i.toLong, rnd.nextLong(2000) - 1000 + (if (i % 7 == 0) 0 else 1) * rnd.nextLong(3))
  }.toDF("k", "id", "v").cache()

  test("selfWithin matches the brute-force predicate exactly") {
    val delta = 100L
    val got = RangeJoin.selfWithin(data, "k", "id", "v", delta)
      .select($"k", $"id_a", $"id_b", $"gap")
      .as[(Int, Long, Long, Long)].collect().toSet
    val rows = data.as[(Int, Long, Long)].collect()
    val want = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && math.abs(a._3 - b._3) <= delta
    } yield (a._1, a._2, b._2, math.abs(a._3 - b._3))).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce pairs")
    assert(want.exists(_._4 == 0) || want.exists(_._4 <= 3),
      "fixture should include tight pairs")
  }

  test("inclusive boundary: gap == delta joins, gap == delta + 1 does not") {
    val df = Seq((1, 10L, 0L), (1, 11L, 5L), (1, 12L, 6L)).toDF("k", "id", "v")
    val got = RangeJoin.selfWithin(df, "k", "id", "v", delta = 5L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L), (11L, 12L)), s"got $got")
  }

  test("bucket edges and negative values bucket with floor semantics") {
    // -5 and +5 with delta 10: |diff| = 10 <= 10 must join even though
    // truncating division would put both in bucket 0 while floor puts
    // -5 in bucket -1 (the adjacent-bucket probe must still find it)
    val df = Seq((1, 1L, -5L), (1, 2L, 5L), (1, 3L, -16L)).toDF("k", "id", "v")
    val got = RangeJoin.selfWithin(df, "k", "id", "v", delta = 10L)
      .select($"id_a", $"id_b", $"gap").as[(Long, Long, Long)].collect().toSet
    // (1,3): |-5 - -16| = 11 > 10 and (2,3): 21 > 10 stay out
    assert(got == Set((1L, 2L, 10L)), s"got $got")
  }

  test("no duplicate pairs from the 3-bucket fan-out") {
    val delta = 100L
    val out = RangeJoin.selfWithin(data, "k", "id", "v", delta)
      .groupBy($"k", $"id_a", $"id_b").count()
      .filter($"count" > 1).count()
    assert(out == 0L)
  }

  test("within: two-table form, signed diff, both directions") {
    val clicks = Seq((1, 100L, 1000L), (2, 101L, 5000L)).toDF("k", "cid", "ct")
    val convs = Seq((1, 200L, 1400L), (1, 201L, 600L), (1, 202L, 1501L),
      (2, 203L, 5500L)).toDF("k", "vid", "vt")
    val got = RangeJoin.within(clicks, convs, "k", "cid", "ct", "vid", "vt",
      delta = 500L)
      .select($"left_id", $"right_id", $"diff")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 200L, 400L), (100L, 201L, -400L),
      (101L, 203L, 500L)), s"got $got")
  }

  test("plan: equi-join on (key, bucket), no Cartesian/BNL term") {
    val plan = RangeJoin.selfWithin(data, "k", "id", "v", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("delta must be at least 1") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.selfWithin(data, "k", "id", "v", 0L)
    }
    assert(e.getMessage.contains("delta"))
  }

  test("intervalOverlap matches the brute-force overlap predicate exactly") {
    val rnd2 = new scala.util.Random(11)
    // intervals straddle 0 and bucket edges; spans 0..~600 over 250-wide
    // buckets exercise 1-, 2- and 3-bucket spans
    def mk(n: Int, tag: Int) = (0 until n).map { i =>
      val s = rnd2.nextLong(2000) - 1000
      (i % 4, (tag * 1000 + i).toLong, s, s + rnd2.nextLong(600))
    }
    val ls = mk(80, 1); val rs = mk(90, 2)
    val lf = ls.toDF("k", "id", "s", "e")
    val rt = rs.toDF("k", "id", "s", "e")
    val got = RangeJoin.intervalOverlap(lf, rt, "k", "id", "s", "e",
        "id", "s", "e", bucketMs = 250L)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "no duplicate pairs from shared buckets")
    val want = (for {
      a <- ls; b <- rs
      if a._1 == b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2,
      math.min(a._4, b._4) - math.max(a._3, b._3))).toSet
    assert(got.toSet == want)
  }

  test("intervalOverlap: inverted/null intervals drop; giant spans fail fast") {
    val lf = Seq((1, 10L, 100L, 50L), (1, 11L, 0L, 10L)).toDF("k", "id", "s", "e")
    val rt = Seq((1, 20L, 5L, 8L)).toDF("k", "id", "s", "e")
    val out = RangeJoin.intervalOverlap(lf, rt, "k", "id", "s", "e",
      "id", "s", "e", bucketMs = 100L)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1, 11L, 20L, 3L)), "inverted interval overlaps nothing")
    val giant = Seq((1, 30L, 0L, 1000000L)).toDF("k", "id", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(giant, rt, "k", "id", "s", "e",
        "id", "s", "e", bucketMs = 10L, maxSpanBuckets = 100)
    }
    assert(e.getMessage.contains("maxSpanBuckets") ||
      e.getMessage.contains("buckets"))
  }
}

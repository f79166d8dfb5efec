package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference percentile_disc: smallest element whose rank >= ceil(p*n),
    * computed with exact BigDecimal arithmetic. */
  private def disc(sorted: Seq[Long], p: Double): Long = {
    val n = sorted.size
    val r = (BigDecimal(p) * n).setScale(0, BigDecimal.RoundingMode.CEILING).toInt
    sorted(math.max(r, 1) - 1)
  }

  test("exactPercentiles matches a sorted-seq percentile_disc reference") {
    val vals = (1L to 200L) ++ (1L to 50L) // duplicates exercise the histogram
    val df = vals.zipWithIndex
      .map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }
      .toDF("g", "v")
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = Stats.exactPercentiles(df, "g", "v", ps)
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
    for (g <- Seq("a", "b"); p <- ps) {
      val sorted = vals.zipWithIndex
        .filter { case (_, i) => (if (i % 2 == 0) "a" else "b") == g }
        .map(_._1).sorted
      assert(got((g, p)) == disc(sorted, p), s"group $g p $p")
    }
  }

  test("cardinalityProfile: estimates near exact; split profiles merge " +
      "to the whole without rescanning") {
    // key a: 10k rows over 5k distinct; key b: 100 rows, all distinct
    val rows = (0 until 10000).map(i => ("a", s"v${i % 5000}")) ++
      (0 until 100).map(i => ("b", s"w$i"))
    val df = rows.toDF("k", "v").repartition(8)
    val prof = Stats.cardinalityProfile(df, "k", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof("a")._1 == 10000L && prof("b")._1 == 100L)
    assert(math.abs(prof("a")._2 - 5000L) < 250, s"a est ${prof("a")._2}")
    assert(math.abs(prof("b")._2 - 100L) <= 2, s"b est ${prof("b")._2}")

    // the mergeable claim: per-half profiles union into the whole's
    // numbers without touching the data again
    val (h1, h2) = rows.splitAt(6000)
    val merged = Stats.mergeCardinalityProfiles(Seq(
      Stats.cardinalityProfile(h1.toDF("k", "v"), "k", "v"),
      Stats.cardinalityProfile(h2.toDF("k", "v"), "k", "v")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged("a")._1 == 10000L && merged("b")._1 == 100L)
    assert(merged("a")._2 == prof("a")._2,
      "HLL registers are order-free: merged halves equal the single pass")
    assert(merged("b")._2 == prof("b")._2)
  }

  test("rank is exact when p*n is an integer in rational arithmetic") {
    // p=0.035, n=200: the double product is 7.000000000000001, so a
    // double-ceil returns rank 8 — the exact-integer rank must be 7
    val df = (1L to 200L).map(("g", _)).toDF("g", "v")
    val out = Stats.exactPercentiles(df, "g", "v", Seq(0.035)).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 7L, "rank ceil(0.035*200) must be exactly 7")
  }

  test("p=1.0 returns the max; singleton groups return their element") {
    val df = Seq(("x", 41L), ("x", 99L), ("y", 7L)).toDF("g", "v")
    val got = Stats.exactPercentiles(df, "g", "v", Seq(0.5, 1.0))
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
    assert(got(("x", 1.0)) == 99L)
    assert(got(("x", 0.5)) == 41L)
    assert(got(("y", 0.5)) == 7L && got(("y", 1.0)) == 7L)
  }

  test("out-of-range percentiles are rejected") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Stats.exactPercentiles(df, "g", "v", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Stats.exactPercentiles(df, "g", "v", Seq(1.5))
    }
  }

  test("quantileBuckets: equi-depth quartiles over 1..8, boundary falls low") {
    val df = (1L to 8L).map(v => (v, v)).toDF("id", "v")
    val out = Stats.quantileBuckets(df, "id", "v", nBuckets = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // type-7 cuts of 1..8 at (.25,.5,.75) = (2.75, 4.5, 6.25)
    assert(out.map(r => (r._1, r._3)).toSeq ==
      Seq((1L,0L),(2L,0L),(3L,1L),(4L,1L),(5L,2L),(6L,2L),(7L,3L),(8L,3L)))
    intercept[IllegalArgumentException] {
      Stats.quantileBuckets(df, "id", "v", nBuckets = 1)
    }
  }

  test("quantileBuckets: the approx scale path buckets equivalently at small N") {
    // pinned to ONE partition: approx_percentile is a mergeable sketch
    // whose result can depend on partition merge order, so an unpinned
    // local[n] split could flake this exact-expectation assertion
    val df = (1L to 8L).map(v => (v, v)).toDF("id", "v").repartition(1)
    val out = Stats.quantileBuckets(df, "id", "v", nBuckets = 2, approx = true)
      .groupBy($"bucket").count().as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L) && out.map(_._2).sum == 8L)
    assert(out.forall(_._2 == 4L), s"equi-depth halves expected: ${out.toSeq}")
  }

  test("quantileBuckets: null metric lands in bucket 0 and is excluded from cuts") {
    val df = Seq[(Long, java.lang.Long)]((1L, 1L), (2L, null), (3L, 2L),
      (4L, 3L), (5L, 4L)).toDF("id", "v")
    val out = Stats.quantileBuckets(df, "id", "v", nBuckets = 2)
      .as[(Long, Option[Long], Long)].collect().sortBy(_._1)
    // cuts over {1,2,3,4} -> median 2.5; null row present, bucket 0
    assert(out.map(r => (r._1, r._3)).toSeq ==
      Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L)))
  }

  test("quantileBuckets: a value equal to a cut stays in the lower bucket") {
    // 1..5: cuts (2, 3, 4); v=2 -> bucket 0, v=3 -> 1, v=4 -> 2
    val df = (1L to 5L).map(v => (v, v)).toDF("id", "v")
    val out = Stats.quantileBuckets(df, "id", "v", nBuckets = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).map(_._3)
    assert(out.toSeq == Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("volumeZScores: per-key baseline, exact arithmetic, zero-variance NULL") {
    // key a: buckets with counts 1, 3 (ts 0-99 -> bucket 0; 100-199 -> 1)
    //   mean 2, var ((1+9) - 16/2)/2 = 1, std 1 -> z = -1 and +1
    // key b: two buckets of count 2 each -> zero variance -> z NULL
    val evs = Seq(
      ("a", 10L), ("a", 110L), ("a", 120L), ("a", 130L),
      ("b", 10L), ("b", 20L), ("b", 110L), ("b", 120L)
    ).toDF("k", "ts")
    val out = Stats.volumeZScores(evs, "k", "ts", periodMs = 100L)
      .as[(String, Long, Long, Option[Double])].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("a", 0L, 1L), ("a", 1L, 3L), ("b", 0L, 2L), ("b", 1L, 2L)))
    assert(out(0)._4.contains(-1.0) && out(1)._4.contains(1.0))
    assert(out(2)._4.isEmpty && out(3)._4.isEmpty,
      "constant-rate key has no scale to score against")
    // null key/ts rows drop rather than forming a null bucket
    val dirty = Stats.volumeZScores(
      Seq[(String, java.lang.Long)](("a", 10L), (null, 20L), ("a", null))
        .toDF("k", "ts"), "k", "ts", periodMs = 100L)
    assert(dirty.count() == 1L)
  }

  test("percentRanks: histogram ranks equal the ANSI percent_rank window exactly") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 400).map(i =>
      (i.toLong, s"k${i % 3}", rnd.nextInt(20).toLong))
    val df = rows.toDF("id", "k", "v")
    val got = Stats.percentRanks(df, "id", "k", "v")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v")
    val want = df.withColumn("pr", percent_rank().over(w))
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq, "must replicate ANSI percent_rank bit-for-bit")
    // single-row key scores 0; null key/metric rows drop
    val solo = Stats.percentRanks(
      Seq[(Long, String, java.lang.Long)]((1L, "a", 5L), (2L, null, 5L),
        (3L, "a", null)).toDF("id", "k", "v"), "id", "k", "v")
      .as[(Long, String, Long, Double)].collect()
    assert(solo.toSeq == Seq((1L, "a", 5L, 0.0)))
  }

  test("robustZScores: median/MAD baseline ignores the outlier, zero-MAD NULL") {
    // key a: 1,2,3,4,1000 -> median 3... no: median of 5 values = 3rd = 3?
    // type-7 over {1,2,3,4,1000}: position 0.5*(5-1)=2 -> exact value 3.
    // deviations {2,1,0,1,997} -> median 1 -> MAD 1.
    // z(1000) = (1000-3)/1.4826 = 672.5; a mean/std z would be ~1.79 —
    // the robustness point, asserted as a bound
    val df = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 4L), (5L, "a", 1000L),
      (6L, "b", 7L), (7L, "b", 7L), (8L, "b", 7L)).toDF("id", "k", "v")
    val out = Stats.robustZScores(df, "id", "k", "v")
      .as[(Long, String, Long, Option[Double])].collect().sortBy(_._1)
    val zOutlier = out.find(_._1 == 5L).get._4.get
    assert(math.abs(zOutlier - (1000.0 - 3.0) / (1.4826 * 1.0)) < 1e-9)
    assert(zOutlier > 100.0, "robust scale must not be dragged by the outlier")
    assert(out.find(_._1 == 3L).get._4.get == 0.0, "the median scores 0")
    assert(out.filter(_._2 == "b").forall(_._4.isEmpty),
      "constant key has MAD 0 -> NULL z")
  }

  test("robustZScores: histogram form equals the percentile-aggregate form bit-for-bit") {
    // random long metrics with heavy ties, odd/even key sizes, a
    // single-row key, and a zero-MAD key — the r13 histogram rewrite must
    // reproduce the expr("percentile(..., 0.5)") formulation's doubles
    // exactly (type-7 medians of integer metrics and their |deviations|
    // are dyadic, so every interpolation association agrees)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 501).map(i =>
      (i.toLong, s"k${i % 4}", rnd.nextInt(25).toLong)) ++
      Seq((9000L, "solo", 42L)) ++ (0 until 6).map(i => (9100L + i, "const", 5L))
    val df = rows.toDF("id", "k", "v")
    val got = Stats.robustZScores(df, "id", "k", "v")
      .as[(Long, String, Long, Option[Double])].collect().sortBy(_._1)
    val m = df.select($"id", $"k".as("key"), $"v".cast("long").as("metric"))
    val meds = m.groupBy($"key").agg(expr("percentile(metric, 0.5)").as("_med"))
    val joined = m.join(meds, Seq("key"))
    val mads = joined.groupBy($"key")
      .agg(expr("percentile(abs(cast(metric as double) - _med), 0.5)").as("_mad"))
    val want = joined.join(mads, Seq("key"))
      .select($"id", $"key", $"metric",
        when($"_mad" > 0.0,
          ($"metric".cast("double") - $"_med") / (lit(1.4826) * $"_mad")).as("z"))
      .as[(Long, String, Long, Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }
}

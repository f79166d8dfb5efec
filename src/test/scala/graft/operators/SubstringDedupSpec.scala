package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def spansOf(df: org.apache.spark.sql.DataFrame, n: Int,
      hashed: Boolean = true): Set[(Long, Long, Long)] =
    SubstringDedup.duplicatedSpans(df, "id", "text", n = n, hashed = hashed)
      .as[(Long, Long, Long)].collect().toSet

  test("cross-document duplicated window becomes one maximal span on both docs") {
    // docs 1 and 2 share the 4-token run "p q r s"; n=3 covers it with two
    // overlapping windows that must merge to a single [start, start+3] span
    val df = Seq(
      (1L, "a b p q r s c d"),
      (2L, "x p q r s y z w"),
      (3L, "u v w1 w2 w3 w4 w5 w6")).toDF("id", "text")
    assert(spansOf(df, 3) == Set((1L, 3L, 6L), (2L, 2L, 5L)))
  }

  test("within-document repetition is duplication (suffix-array semantics)") {
    val df = Seq((7L, "m n o z1 z2 m n o")).toDF("id", "text")
    assert(spansOf(df, 3) == Set((7L, 1L, 3L), (7L, 6L, 8L)))
  }

  test("adjacent-but-not-overlapping spans merge; disjoint ones do not") {
    // doc 1 holds two duplicated 2-windows back to back ([1,2] and [3,4]):
    // end+1 adjacency merges them into [1,4]; doc 4's copy at distance
    // stays separate from its own later hit
    val df = Seq(
      (1L, "a b c d tail1 tail2"),
      (2L, "a b x1 x2 x3 x4"),
      (3L, "c d y1 y2 y3 y4"),
      (4L, "q r gap1 gap2 gap3 q r")).toDF("id", "text")
    val s = spansOf(df, 2)
    assert(s.contains((1L, 1L, 4L)))
    assert(s.filter(_._1 == 4L) == Set((4L, 1L, 2L), (4L, 6L, 7L)))
  }

  test("minCount raises the duplication bar") {
    val df = Seq(
      (1L, "a b c t1 t2"), (2L, "a b c t3 t4"), (3L, "a b c t5 t6"),
      (4L, "d e f t7 t8"), (5L, "d e f t9 ta")).toDF("id", "text")
    assert(spansOf(df, 3).map(_._1) == Set(1L, 2L, 3L, 4L, 5L))
    val s3 = SubstringDedup.duplicatedSpans(df, "id", "text", n = 3, minCount = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(s3.map(_._1) == Set(1L, 2L, 3L))
  }

  test("hashed and exact-string keying produce identical spans on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    assert(spansOf(docs, 8, hashed = true) == spansOf(docs, 8, hashed = false))
    assert(spansOf(docs, 8).nonEmpty, "test corpus should contain duplicated 8-grams")
  }

  test("removeDuplicatedSpans drops exactly the covered tokens, all copies") {
    val df = Seq(
      (1L, "a b p q r s c d"),
      (2L, "x p q r s y z w"),
      (3L, "clean doc stays whole here")).toDF("id", "text")
    val out = SubstringDedup.removeDuplicatedSpans(df, "id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((8L, 4L, "a b c d")))
    assert(out(2L) == ((8L, 4L, "x y z w")))
    assert(out(3L) == ((5L, 0L, "clean doc stays whole here")))
  }

  test("documents shorter than n never match; empty text survives removal") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "")).toDF("id", "text")
    assert(spansOf(df, 3).isEmpty)
    val out = SubstringDedup.removeDuplicatedSpans(df, "id", "text", n = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == "a b" && out(3L) == "")
  }

  test("plan shape: partial-agg dup detection, no gram-key window, slim merge") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text")
    val plan = SubstringDedup.duplicatedSpans(docs, "id", "text", n = 8)
      .queryExecution.executedPlan.toString
    // duplicate detection is groupBy-then-semi-join: the count MUST have a
    // map-side partial phase (a hot gram collapses to one row per map
    // partition before the shuffle), and NO window may run over the gram
    // key (a COUNT window would funnel a hot gram into one task — the skew
    // cliff the two-pass design removes). The only window is the
    // gaps-and-islands merge over id.
    assert("partial_count".r.findAllIn(plan).nonEmpty,
      s"gram count must partial-aggregate map-side:\n$plan")
    assert("windowspecdefinition\\(k#".r.findAllIn(plan).isEmpty,
      s"no window may partition by the gram key:\n$plan")
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 2,
      s"expected the two id-partitioned merge windows (lag + running sum), got $windows:\n$plan")
    // exchange budget: gram-key count, gram-key semi-join side(s), id window
    // — and the (id, island) aggregation reuses the window's
    // HashPartitioning(id), adding none
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"expected <= 3 wide exchanges (gram count + gram join + id), got $exchanges:\n$plan")
  }
}

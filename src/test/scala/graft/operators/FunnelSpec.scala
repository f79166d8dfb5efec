package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (user, ts, type): u1 completes A->B->C; u2 does B before A (no chain
  // past A); u3 never does A (absent from output); u4 does A only
  private lazy val ev = Seq(
    (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
    (2L, 50L, "B"), (2L, 60L, "A"),
    (3L, 5L, "B"), (3L, 6L, "C"),
    (4L, 100L, "A")
  ).toDF("user_id", "ts", "event_type")

  test("chains: greedy earliest completion, NULL from first missed step") {
    val out = Funnel.chains(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"))
      .orderBy($"user_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq(
      (1L, 10L, Some(20L), Some(30L)),
      (2L, 60L, None, None),      // B happened BEFORE A — must not chain
      (4L, 100L, None, None)))
  }

  test("chains: greedy takes the FIRST step-1 event even when a later one would also chain") {
    val e = Seq(
      (1L, 10L, "A"), (1L, 40L, "A"), (1L, 50L, "B")).toDF("user_id", "ts", "event_type")
    val out = Funnel.chains(e, "user_id", "ts", "event_type", Seq("A", "B"))
      .as[(Long, Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, 10L, Some(50L))))
  }

  test("chains: same-instant events never chain (strict >)") {
    val e = Seq((1L, 10L, "A"), (1L, 10L, "B"), (1L, 11L, "B"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.chains(e, "user_id", "ts", "event_type", Seq("A", "B"))
      .as[(Long, Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, 10L, Some(11L))))
  }

  test("counts: non-increasing step totals over the same greedy chain") {
    val out = Funnel.counts(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"))
      .orderBy($"step")
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "A", 3L), (2L, "B", 1L), (3L, "C", 1L)))
  }

  test("retention: cohort = first active period, later activity counted once per period") {
    // period 10: u1 active periods {0,1,3} (two events in p1 dedupe);
    // u2 first seen p1, active {1,3}; u3 only p3
    val e = Seq(
      (1L, 0L), (1L, 12L), (1L, 15L), (1L, 30L),
      (2L, 11L), (2L, 39L),
      (3L, 35L)
    ).toDF("user_id", "ts")
    val out = Funnel.retention(e, "user_id", "ts", periodMs = 10L)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 1L), (0L, 1L, 1L, 1L), (0L, 3L, 3L, 1L),
      (1L, 1L, 0L, 1L), (1L, 3L, 2L, 1L),
      (3L, 3L, 0L, 1L)))
  }

  test("retention: cohort-size row (periods_after=0) counts every cohort member") {
    val e = Seq((1L, 5L), (2L, 7L), (3L, 25L)).toDF("user_id", "ts")
    val out = Funnel.retention(e, "user_id", "ts", periodMs = 10L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, 0L, 2L), (2L, 2L, 0L, 1L)))
    intercept[IllegalArgumentException] {
      Funnel.retention(e, "user_id", "ts", periodMs = 0L)
    }
  }

  test("chains: step events reduce to per-user scalars before joining (no raw-event window)") {
    val p = Funnel.chains(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Window"), s"funnel must not window over raw events:\n$p")
    // every join input reduces to (user, min ts) with a MAP-SIDE partial
    // min before any exchange (the type filter folds into the scan — on a
    // parquet source it shows as PushedFilters)
    assert(p.contains("partial_min"), s"step mins must partial-aggregate:\n$p")
    intercept[IllegalArgumentException] {
      Funnel.chains(ev, "user_id", "ts", "event_type", Seq("A", "A"))
    }
  }

  test("topPaths: first-k timeline order, type tiebreak, count-desc path-asc rank") {
    val e = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      (2L, 5L, "view"), (2L, 6L, "click"), (2L, 7L, "buy"),
      (3L, 1L, "view"), (3L, 2L, "exit"),
      (4L, 9L, "b"), (4L, 9L, "a") // same instant -> type-asc order
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.topPaths(e, "user_id", "ts", "event_type",
        maxSteps = 3, k = 10)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(
      ("view>click>buy", 2L, 1L), ("a>b", 1L, 2L), ("view>exit", 1L, 3L)))
  }

  test("topPaths: maxSteps truncates and k caps the report") {
    val e = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "x"), (3L, 1L, "y")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.topPaths(e, "user_id", "ts", "event_type",
        maxSteps = 2, k = 2)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(("a>b", 1L, 1L), ("x", 1L, 2L)))
    val plan = Funnel.topPaths(e, "user_id", "ts", "event_type", 2, 2)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_firstkaggregator"),
      s"per-user selection must partial-aggregate:\n$plan")
  }

  test("transitions: bucket-stitched counts equal the naive global adjacency") {
    // timelines spanning bucket boundaries, same-bucket runs, a
    // single-event bucket, ties on ts broken by type — every stitch case
    val evs = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"),   // bucket 0: A->B
      (1L, 110L, "C"),                   // bucket 1 single event: B->C link
      (1L, 250L, "A"), (1L, 251L, "A"),  // bucket 2 (bucket 1->2 link C->A)
      (2L, 30L, "B"), (2L, 30L, "A"),    // tie: A orders before B -> A->B
      (3L, 500L, "C")                    // lone event: no transitions
    ).toDF("user_id", "ts", "event_type")
    def naive = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_type")
      evs.withColumn("nx", lead($"event_type", 1).over(w))
        .filter($"nx".isNotNull)
        .groupBy($"event_type".as("from_type"), $"nx".as("to_type"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
    }
    for (bucketMs <- Seq(100L, 7L, 1000000L)) {
      val got = Funnel.transitions(evs, "user_id", "ts", "event_type", bucketMs)
        .as[(String, String, Long)].collect().toSet
      assert(got == naive, s"bucketMs=$bucketMs must not change totals")
    }
    assert(naive.contains(("A", "B", 2L)), "tie-break and bucket-0 run counted")
    assert(naive.contains(("C", "A", 1L)), "cross-bucket link counted")
  }

  test("transitions: null ts/type rows drop; bucketed window never sees a full user history") {
    val evs = Seq[(Long, java.lang.Long, String)](
      (1L, 10L, "A"), (1L, null, "B"), (1L, 20L, null), (1L, 30L, "C")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.transitions(evs, "user_id", "ts", "event_type", 1000L)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("A", "C", 1L)), "dirty rows drop, clean adjacency remains")
  }
}

package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOfJoin attaches latest at-or-before right row per key") {
    val left = Seq(
      (1L, ts(10), "c1"), (1L, ts(20), "c2"), (1L, ts(5), "c0"),
      (2L, ts(15), "c3")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(8), 100L, 1.0), (1L, ts(12), 101L, 2.0),
      (2L, ts(15), 102L, 3.0), (2L, ts(16), 103L, 4.0)
    ).toDF("k", "ts", "rid", "rv")

    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid")
      .select("tag", "right_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(out("c0").isEmpty)            // nothing at-or-before ts=5
    assert(out("c1").contains(100L))     // ts=10 -> right@8
    assert(out("c2").contains(101L))     // ts=20 -> right@12
    assert(out("c3").contains(102L))     // exact-instant right row matches
  }

  test("equal-(key,ts) right rows resolve to the greatest tie column") {
    val left = Seq((1L, ts(10), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(10), 7L, 0.0), (1L, ts(10), 9L, 0.0), (1L, ts(10), 8L, 0.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid")
      .select("right_rid").as[Long].head()
    assert(out == 9L)
  }

  test("forward direction attaches earliest at-or-after right row per key") {
    val left = Seq(
      (1L, ts(10), "c1"), (1L, ts(20), "c2"), (1L, ts(25), "c3"),
      (2L, ts(15), "c4")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(8), 100L, 1.0), (1L, ts(12), 101L, 2.0), (1L, ts(21), 102L, 3.0),
      (2L, ts(15), 103L, 4.0)
    ).toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid",
        direction = "forward")
      .select("tag", "right_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(out("c1").contains(101L))     // ts=10 -> next right@12
    assert(out("c2").contains(102L))     // ts=20 -> next right@21
    assert(out("c3").isEmpty)            // nothing at-or-after ts=25
    assert(out("c4").contains(103L))     // exact-instant right row matches
  }

  test("forward ties resolve to the greatest tie column, like backward") {
    val left = Seq((1L, ts(10), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(12), 7L, 0.0), (1L, ts(12), 9L, 0.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid",
        direction = "forward")
      .select("right_rid").as[Long].head()
    assert(out == 9L)
  }

  test("q45's oracle precondition holds: error events have unique (user, ts)") {
    // DuckDB's ASOF JOIN has no tie-break; asOfJoin resolves equal-(key,ts)
    // right rows by greatest id. The q45 contract is only hash-stable while
    // testdata keeps (user_id, ts) unique among errors — assert it so a
    // regenerated dataset fails HERE with a message, not in the driver diff.
    val dup = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter($"event_type" === "error")
      .groupBy($"user_id", $"ts").count().filter($"count" > 1).count()
    assert(dup == 0L, "duplicate (user_id, ts) error events break q45's oracle parity")
  }

  test("plan is a single shuffle (one Exchange for the window)") {
    val left = Seq((1L, ts(1), "a")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(1), 1L, 0.0)).toDF("k", "ts", "rid", "rv")
    val p = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid")
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"union-and-sweep must shuffle exactly once:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no product-shaped join allowed:\n$p")
  }

  test("tolerance: stale matches NULL out, rows survive, both directions") {
    val left = Seq((1L, 100L, "l1"), (1L, 500L, "l2"), (2L, 100L, "l3"))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 90L, 900L), (2L, 480L, 901L))
      .toDF("k", "ts", "rid")
    // backward, tolerance 50: l1 matches rid 900 (gap 10); l2's latest
    // prior is also 90 (gap 410 -> stale, NULL); l3 has no prior at all
    val back = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid",
        tolerance = Some(50L))
      .select($"lid", $"right_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(back == Map("l1" -> Some(900L), "l2" -> None, "l3" -> None))
    // forward, tolerance 400: l3's next is 480 (gap 380, fresh); l1's next
    // within key 1 does not exist (90 < 100), NULL
    val fwd = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid",
        direction = "forward", tolerance = Some(400L))
      .select($"lid", $"right_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(fwd == Map("l1" -> None, "l2" -> None, "l3" -> Some(901L)))
    // no tolerance -> unchanged semantics (l2 keeps the stale match)
    val plain = AsOfJoin.asOfJoin(left, right, "k", "ts", "rid")
      .select($"lid", $"right_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(plain == Map("l1" -> Some(900L), "l2" -> Some(900L), "l3" -> None))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(left, right, "k", "ts", "rid", tolerance = Some(-1L))
    }
  }
}

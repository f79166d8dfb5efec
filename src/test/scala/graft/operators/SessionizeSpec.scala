package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // user u1: two sessions split by a > gap silence; u2: one session
  private lazy val events = Seq(
    ("u1", 1000L, 1.0), ("u1", 2000L, 2.0), ("u1", 2500L, 3.0),
    ("u1", 10000L, 4.0), ("u1", 10500L, 5.0),
    ("u2", 500L, 10.0), ("u2", 5000L, 20.0)
  ).toDF("user", "ts_ms", "value")

  test("gap rule splits sessions; bounds/counts/totals are exact") {
    val out = Sessionize.sessionize(events, "user", "ts_ms", "value",
        gapMillis = 5000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("u1", 0L, 1000L, 2500L, 3L, 6.0),
      ("u1", 1L, 10000L, 10500L, 2L, 9.0),
      ("u2", 0L, 500L, 5000L, 2L, 30.0)))
  }

  test("a gap exactly equal to gapMillis does NOT split (strict >)") {
    val df = Seq(("u", 0L, 1.0), ("u", 5000L, 1.0)).toDF("user", "ts_ms", "value")
    val n = Sessionize.sessionize(df, "user", "ts_ms", "value", 5000L).count()
    assert(n == 1L)
  }

  test("tied timestamps land in one session regardless of row order") {
    val df = Seq(("u", 100L, 1.0), ("u", 100L, 2.0), ("u", 100L, 4.0))
      .toDF("user", "ts_ms", "value").repartition(3)
    val out = Sessionize.sessionize(df, "user", "ts_ms", "value", 10L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(4) == 3L && out.head.getDouble(5) == 7.0)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-range (band) join — pair rows whose numeric keys lie within a
  * tolerance, without the cross product a naive `|a - b| <= delta`
  * predicate plans to. The canonical instance is the time-window
  * co-occurrence join ("events of the same user within N minutes"), the
  * session-mining / attribution primitive the engine's event rollups
  * (SURVEY §2.9) stop short of.
  *
  * Plan shape: each side is bucketed by `floor(value / delta)`; a row can
  * only match rows in its own or an adjacent bucket, so the candidate set
  * is THREE equi-joins on (key, bucket) — expressed as one equi-join
  * against a 3-way `explode` of the probe side's bucket ids — followed by
  * the exact `|a - b| <= delta` verify. One shuffle per side on
  * (key, bucket), no Cartesian term anywhere, and candidate volume is
  * bounded by the true output volume plus the near-miss rows one bucket
  * over — the standard bucket-and-verify range-join discipline. At 100 TB
  * the shuffle key (key, bucket) spreads hot keys across time, so a single
  * entity's firehose only collides per-window, not per-key (a hot key
  * WITHIN one delta-window is genuinely dense output and salts upstream
  * like any skewed join, [[Skew]]).
  *
  * Determinism: the output is the exact predicate's row set — bucketing
  * only prunes candidates, never admits or drops a true pair
  * (|a - b| <= delta implies bucket distance <= 1 because each bucket
  * spans exactly delta).
  */
object RangeJoin {

  /** Self-join form: unordered pairs (idCol_a < idCol_b) of `df` rows
    * sharing `keyCol` whose `valueCol` differ by at most `delta`. Output:
    * (keyCol, id_a, id_b, gap) with gap = |value_a - value_b| (LONG).
    */
  def selfWithin(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      valueCol: String,
      delta: Long): DataFrame = {
    require(delta >= 1, s"delta must be >= 1 (use an equi-join for exact equality), got $delta")
    val slim = df.select(col(keyCol), col(idCol).cast("long").as("_id"),
      col(valueCol).cast("long").as("_v"))
    val build = slim.select(col(keyCol), col("_id"), col("_v"),
      floorDiv(col("_v"), delta).as("_bucket"))
    // probe side explodes to the 3 admissible buckets; the build side
    // stays single-bucket, so each (probe row, build row) combination
    // matches on exactly ONE bucket value despite the fan-out — no
    // dedup pass (and its exchange) needed
    val probe = slim.select(col(keyCol), col("_id").as("_id_p"),
      col("_v").as("_v_p"),
      explode(array(floorDiv(col("_v"), delta) - 1,
        floorDiv(col("_v"), delta),
        floorDiv(col("_v"), delta) + 1)).as("_bucket"))
    probe.join(build, Seq(keyCol, "_bucket"))
      .filter(col("_id_p") < col("_id") &&
        abs(col("_v_p") - col("_v")) <= delta)
      .select(col(keyCol), col("_id_p").as("id_a"), col("_id").as("id_b"),
        abs(col("_v_p") - col("_v")).as("gap"))
  }

  /** Two-table form: every (left, right) pair sharing `keyCol` with
    * |leftValue - rightValue| <= delta. Output: left's id, right's id,
    * the key, and the signed difference `right - left` (LONG) — the
    * attribution shape ("conversions within N minutes of a click", either
    * direction; filter the sign for one-sided windows).
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftIdCol: String,
      leftValueCol: String,
      rightIdCol: String,
      rightValueCol: String,
      delta: Long): DataFrame = {
    require(delta >= 1, s"delta must be >= 1 (use an equi-join for exact equality), got $delta")
    val build = right.select(col(keyCol),
      col(rightIdCol).cast("long").as("right_id"),
      col(rightValueCol).cast("long").as("_rv"))
      .withColumn("_bucket", floorDiv(col("_rv"), delta))
    val probe = left.select(col(keyCol),
      col(leftIdCol).cast("long").as("left_id"),
      col(leftValueCol).cast("long").as("_lv"))
      .select(col(keyCol), col("left_id"), col("_lv"),
        explode(array(floorDiv(col("_lv"), delta) - 1,
          floorDiv(col("_lv"), delta),
          floorDiv(col("_lv"), delta) + 1)).as("_bucket"))
    probe.join(build, Seq(keyCol, "_bucket"))
      .filter(abs(col("_lv") - col("_rv")) <= delta)
      .select(col(keyCol), col("left_id"), col("right_id"),
        (col("_rv") - col("_lv")).as("diff"))
  }

  /** Interval-overlap join: every (left, right) pair sharing `keyCol`
    * whose CLOSED intervals [start, end] overlap — `ls <= re AND
    * rs <= le` — the attribution / concurrency primitive ("sessions
    * overlapping an incident window", "ad exposures concurrent with a
    * visit") that a naive overlap predicate plans as a per-key cross
    * product. Output: (keyCol, left_id, right_id, overlap_ms LONG =
    * min(ends) - max(starts), >= 0 for touching intervals).
    *
    * Plan shape: each interval explodes into the `bucketMs`-wide buckets
    * it SPANS and the join is an equi-join on (key, bucket); a true pair
    * shares every bucket their overlap covers, so the pair is attributed
    * to exactly ONE of them — the bucket containing the overlap's start,
    * `floor(max(ls, rs) / bucketMs)` — which makes the output exact
    * WITHOUT a dropDuplicates exchange (the [[selfWithin]] no-dedup
    * discipline generalized to spans). Candidate volume per bucket is
    * |left intervals live in it| x |right intervals live in it| — output-
    * shaped when `bucketMs` is near the typical interval length.
    *
    * Guards: rows with start > end or NULL bounds DROP (an inverted
    * interval overlaps nothing by the closed-interval definition);
    * `maxSpanBuckets` fail-fasts (early-exit probe, the
    * [[Knn.marginTopK]] discipline) when any interval spans more buckets
    * than the cap — an unbounded span explodes into unbounded rows, and
    * the fix (a larger `bucketMs`, or splitting pathological intervals
    * upstream) is a caller decision, not a silent drop.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftIdCol: String,
      leftStartCol: String,
      leftEndCol: String,
      rightIdCol: String,
      rightStartCol: String,
      rightEndCol: String,
      bucketMs: Long,
      maxSpanBuckets: Int = 1000): DataFrame = {
    require(bucketMs >= 1, s"bucketMs must be >= 1, got $bucketMs")
    require(maxSpanBuckets >= 1,
      s"maxSpanBuckets must be >= 1, got $maxSpanBuckets")
    def prep(df: DataFrame, id: String, s: String, e: String,
        idOut: String, sOut: String, eOut: String): DataFrame =
      df.select(col(keyCol), col(id).cast("long").as(idOut),
          col(s).cast("long").as(sOut), col(e).cast("long").as(eOut))
        .filter(col(sOut).isNotNull && col(eOut).isNotNull &&
          col(sOut) <= col(eOut))
    val l = prep(left, leftIdCol, leftStartCol, leftEndCol, "left_id", "_ls", "_le")
    val r = prep(right, rightIdCol, rightStartCol, rightEndCol, "right_id", "_rs", "_re")
    def spanGuard(df: DataFrame, s: String, e: String, side: String): Unit = {
      val over = df.filter(
        floorDiv(col(e), bucketMs) - floorDiv(col(s), bucketMs) >=
          maxSpanBuckets.toLong).limit(1).count()
      require(over == 0L,
        s"intervalOverlap: a $side interval spans >= $maxSpanBuckets buckets " +
          s"of $bucketMs ms — raise bucketMs or split pathological intervals " +
          "upstream (an unbounded span explodes into unbounded candidate rows)")
    }
    spanGuard(l, "_ls", "_le", "left")
    spanGuard(r, "_rs", "_re", "right")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bucket",
        explode(sequence(floorDiv(col(s), bucketMs), floorDiv(col(e), bucketMs))))
    explodeBuckets(l, "_ls", "_le")
      .join(explodeBuckets(r, "_rs", "_re"), Seq(keyCol, "_bucket"))
      .filter(col("_ls") <= col("_re") && col("_rs") <= col("_le") &&
        floorDiv(greatest(col("_ls"), col("_rs")), bucketMs) === col("_bucket"))
      .select(col(keyCol), col("left_id"), col("right_id"),
        (least(col("_le"), col("_re")) -
          greatest(col("_ls"), col("_rs"))).as("overlap_ms"))
  }

  /** Java-semantics floor division as a Column, in EXACT integer
    * arithmetic: SQL's `div` truncates toward zero (wrong bucket for
    * negative values), and a double-division floor can land one bucket
    * off when v/d sits on an integer boundary (epoch-microsecond values
    * flirt with 2^53) — either would break the never-drops-a-true-pair
    * guarantee.
    */
  private[operators] def floorDiv(v: Column, d: Long): Column = {
    require(d > 0, "bucket width must be positive")
    val m = (v % d + d) % d // floorMod, non-negative
    // (v - m) is an exact multiple of d; the double quotient of two
    // exactly-representable longs with an integer result is that integer
    ((v - m) / d).cast("long")
  }
}

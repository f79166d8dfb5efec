package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — SURVEY.md §2.3 lists it as absent from
  * both the reference and Spark's built-ins; it is the canonical
  * event-enrichment shape for training-data and feature pipelines ("attach
  * the most recent prior X to every Y").
  *
  * Implementation is the UNION-AND-SWEEP plan, not a range join: tag both
  * inputs, union them, and sweep each key's timeline once with a running
  * `last(right_payload, ignoreNulls)` window. Cost is ONE shuffle of
  * slim tagged rows + a linear scan per key — no candidate explosion,
  * no range-bucketing tuning, skew bounded by the hottest key's event
  * count. A broadcast-range join would ship the whole right side; a theta
  * join would be quadratic per key. This plan survives 100×.
  */
object AsOfJoin {

  /** As-of LEFT join: every left row gets, for `direction = "backward"`
    * (default), the LATEST right row of the same key with `right.ts <=
    * left.ts` (at-or-before, matching DuckDB/kdb ASOF — a right row at the
    * exact left timestamp matches); for `direction = "forward"`, the
    * EARLIEST right row with `right.ts >= left.ts` (at-or-after — "next
    * event from now", the other half of the pandas merge_asof surface).
    * Forward is the same union-and-sweep plan with the timeline swept in
    * reverse — still one shuffle, still no candidate explosion.
    *
    * `left`/`right`: any schemas containing `keyCol` and `tsCol`; payload
    * column names must not collide after the right side's are prefixed.
    * Output: every left row (all its columns) + each right payload column
    * renamed `right_<name>` (NULL when no right row in direction exists).
    *
    * Determinism: among right rows sharing (key, ts), the greatest
    * `rightTieCol` wins — pass the right side's unique id.
    *
    * `tolerance` (optional, requires a NUMERIC `tsCol` — epoch millis):
    * maximum staleness. A match farther than `tolerance` from the left
    * row NULLs out (the row itself survives — left-join semantics), the
    * pandas `merge_asof(tolerance=...)` / feature-store max-staleness
    * contract: "most recent prior feature value, but never older than T".
    * Same one-shuffle sweep; the check is a post-sweep per-row predicate.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightTieCol: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == tsCol)
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol)
    require(rightPayload.contains(rightTieCol),
      s"rightTieCol $rightTieCol must be a right payload column")
    require(leftPayload.nonEmpty,
      "left needs at least one payload column besides key/ts (an id)")
    require(!rightPayload.contains("_tie"),
      "right payload may not contain a column named _tie (reserved)")
    require(!rightPayload.contains("_mts"),
      "right payload may not contain a column named _mts (reserved)")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))

    val rp = struct((col(rightTieCol).as("_tie") +: col(tsCol).as("_mts") +:
      rightPayload.map(col)): _*)
    val lp = struct(leftPayload.map(col): _*)

    val r = right.select(col(keyCol), col(tsCol), lit(0).as("_side"),
      rp.as("_rp"), lit(null).cast(left.select(lp).schema.head.dataType).as("_lp"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("_side"),
      lit(null).cast(right.select(rp).schema.head.dataType).as("_rp"), lp.as("_lp"))

    // right rows (_side=0) sort BEFORE left rows at equal ts, so the
    // running last() has already absorbed a same-instant right row when
    // the left row is evaluated; _tie breaks equal-(key,ts) right rows.
    // forward = the identical sweep over the REVERSED timeline: descending
    // ts means the running last right row seen is the closest at-or-after
    val tsOrder = if (direction == "forward") col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("_side"), col("_rp._tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // within-tolerance gate: direction already guarantees the signed gap
    // is >= 0, so one upper-bound compare decides; no tolerance -> always
    val fresh = tolerance.fold(lit(true)) { t =>
      val gap =
        if (direction == "forward") col("_match._mts") - col(tsCol)
        else col(tsCol) - col("_match._mts")
      gap <= t
    }
    r.unionByName(l)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((col(keyCol) +: col(tsCol) +:
        leftPayload.map(c => col(s"_lp.$c").as(c)) ++:
        rightPayload.map(c =>
          when(fresh, col(s"_match.$c")).as(s"right_$c"))): _*)
  }
}

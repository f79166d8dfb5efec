package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the offline twin of
  * [[graft.streaming.Streams.sessionize]] (reference analog: the engine's
  * batch-progress session semantics; the streaming variant documents the
  * rule: a session closes after `gapMillis` of event-time silence).
  *
  * Plan shape: one shuffle on the user key, one in-partition sort by the
  * event-time column, then a window `lag` + running `sum` to assign session
  * ids and a hash aggregation to collapse them. Per-user history never has
  * to fit in memory (Spark's window sort is external), so the plan holds at
  * 100 TB as long as no single user is a whole-cluster hot key — the usual
  * remedy (pre-split ultra-hot users by day) composes on top of this.
  *
  * Determinism with tied timestamps: both the `lag` diff and the default
  * RANGE window frame treat equal-`ts` rows as peers — tied rows always
  * land in the same session regardless of their physical order, and every
  * emitted aggregate is therefore order-independent (the value sum goes
  * through DECIMAL(18,4)). An external SQL engine reproduces the output
  * bit-for-bit.
  */
object Sessionize {

  /** One row per (user, session): session bounds in epoch-ms, event count,
    * exact value total. `tsMsCol` must be epoch milliseconds (LongType) —
    * callers reading nanosecond parquet convert with `ts DIV 1000000`.
    */
  def sessionize(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      valueCol: String,
      gapMillis: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsMsCol))
    val brk: Column =
      when(col(tsMsCol) - lag(col(tsMsCol), 1).over(byUser) > gapMillis, 1L)
        .otherwise(0L)
    df.select(col(userCol), col(tsMsCol), col(valueCol))
      .withColumn("session_id", sum(brk).over(byUser))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsMsCol)).as("session_start_ms"),
        max(col(tsMsCol)).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("total_value"))
  }
}

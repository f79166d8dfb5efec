package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Helpers for BOUNDED global ranking.
  *
  * Several operators rank a frame that is already top-k-bounded (post
  * `orderBy().limit(k)`, post threshold-filter of a top-k result): the rank
  * window is global but provably tiny, so the single-partition exchange it
  * plans is k rows — not a scale concern. These helpers centralize that
  * pattern so every global window in the codebase is either (a) spelled
  * `boundedRank`/`boundedGlobal`, meaning someone argued its input is
  * bounded, or (b) a bug.
  *
  * WindowExec logs "No Partition Defined ... serious performance
  * degradation" for every such window. A constant partition key does NOT
  * help — Catalyst folds literal partition expressions away (verified on
  * Spark 4.1: `partitionBy(lit(0))` optimizes to an empty partition spec) —
  * so harness entry points whose global windows are all of the bounded kind
  * call [[muteNoPartitionWarning]] instead, scoped to exactly that logger.
  */
object windows {

  /** Window spec for ranking a bounded frame globally. */
  def boundedGlobal(sort: Column*): WindowSpec = Window.orderBy(sort: _*)

  /** `row_number` over [[boundedGlobal]] — the bounded global rank. */
  def boundedRank(sort: Column*): Column =
    row_number().over(boundedGlobal(sort: _*))

  /** Raise the WindowExec logger to ERROR, silencing the unpartitioned-
    * window warning. Call ONLY from entry points (bench, verify, demo, test
    * harness) whose global windows are known-bounded — the warning stays on
    * by default for library users, for whom an unbounded global window is a
    * real scale bug worth hearing about.
    */
  def muteNoPartitionWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}

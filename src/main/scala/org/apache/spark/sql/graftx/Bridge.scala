package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Minimal bridge into Spark's `private[sql]` surface.
  *
  * Lives under `org.apache.spark.sql` so it can reach the classic-session
  * internals (Column <-> Catalyst Expression conversion and the session
  * function registry). Everything else in the engine stays in `graft.*`
  * and goes through this one seam, keeping the blast radius of any future
  * Spark API change to a single file.
  */
object Bridge {

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions only). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (the `Dataset.ofRows` seam) — the
    * table-function bridge: an injected TVF builder receives child plans
    * and must return a plan, while the engine's operators speak DataFrame.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The logical plan under a DataFrame (inverse of [[ofRows]]). */
  def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** Register a temp SQL function backed by a Catalyst expression builder,
    * e.g. `SELECT vec_cosine_sim(a, b)`.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Register a temp TABLE function (plan builder) on a live session,
    * e.g. `SELECT * FROM sessionize(TABLE(events), ...)` — the
    * already-running-session twin of `SparkSessionExtensions
    * .injectTableFunction`.
    */
  def registerTableFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => LogicalPlan): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}

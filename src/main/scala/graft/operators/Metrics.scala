package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.collection.concurrent.TrieMap

/** Engine-side observability (SURVEY §2.4 A5 / §2.11): the reference keeps a
  * Prometheus-style registry of counters/gauges/histograms
  * (monitoring/metrics.py:69-122). The Spark-native analog is `observe()`
  * metrics — aggregates computed inside the running plan for free — captured
  * by a QueryExecutionListener into a queryable registry.
  */
object Metrics {

  /** Attach named observed metrics to a DataFrame; they are computed during
    * whatever action runs the plan (no extra pass).
    */
  def observed(df: DataFrame, name: String, exprs: (String, Column)*): DataFrame = {
    require(exprs.nonEmpty, "need at least one metric expression")
    val cols = exprs.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  /** Listener capturing observed-metric rows per observation name. */
  class Registry extends QueryExecutionListener {
    private val metrics = TrieMap.empty[String, Map[String, Any]]

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        metrics.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

    def get(name: String): Option[Map[String, Any]] = metrics.get(name)
    def snapshot: Map[String, Map[String, Any]] = metrics.toMap
    def clear(): Unit = metrics.clear()
  }

  /** Install a registry on the session. Caller keeps the handle. */
  def install(spark: SparkSession): Registry = {
    val r = new Registry
    spark.listenerManager.register(r)
    r
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared events-table reader (SURVEY.md §2.9 input contract).
  *
  * The driver's `events.parquet` has shipped `ts` two ways across rounds:
  * INT64 TIMESTAMP(NANOS) (readable only as a long under
  * `spark.sql.legacy.parquet.nanosAsLong`) and INT64 TIMESTAMP(MICROS)
  * (surfacing as TIMESTAMP_NTZ). Hard-coding either contract breaks when
  * the driver flips — exactly the round-9 q8/q24 regression. This reader
  * probes the file's actual schema and normalizes to an
  * `event_time: TIMESTAMP` column alongside the raw `ts`, so every
  * consumer (batch rollups, streaming rollups, sessionize) decodes event
  * time one way.
  *
  * `event_time` is always TimestampType (session-TZ instant): the NTZ cast
  * is wall-clock-preserving under any fixed session zone (Verify/Bench pin
  * UTC), and keeping one output type means the `SessionEvent` encoder and
  * watermark column never depend on which contract the file carried.
  */
object Events {

  /** Derive `event_time: TIMESTAMP` from whatever physical type `ts` has. */
  def withEventTime(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case TimestampType | TimestampNTZType =>
      df.withColumn("event_time", col("ts").cast(TimestampType))
    case LongType => // legacy nanos-as-long contract
      df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts must be a TIMESTAMP or LONG(nanos) column, got $other")
  }

  /** Batch read of `$dir/events.parquet` with normalized `event_time`. */
  def read(spark: SparkSession, dir: String): DataFrame =
    withEventTime(spark.read.parquet(s"$dir/events.parquet"))

  /** Declared-schema fallback for the cold-start case: the current driver
    * contract (ts = TIMESTAMP(MICROS), surfacing as TIMESTAMP_NTZ). Only
    * used when the probe finds nothing to probe; once a file exists the
    * probed physical type always wins.
    */
  val DefaultEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema probe for the streaming source. File streams require an
    * explicit schema, and declaring the wrong one silently reinterprets
    * bits (a LongType declaration over a MICROS column was the round-9
    * q24 1000x timeline compression). One batch footer read settles it.
    *
    * Bootstrap edge: a stream is often *defined* before the first file
    * drop lands, and a batch probe of an empty (or not-yet-existing)
    * directory throws `Unable to infer schema`. In that case we fall back
    * to `fallback` (default [[DefaultEventSchema]]) rather than failing
    * stream definition — the declared fallback only governs until real
    * files exist, at which point probing settles the contract. Pass
    * `fallback = None` to keep strict probe-or-throw behavior.
    */
  def probeSchema(
      spark: SparkSession,
      dir: String,
      glob: Option[String] = None,
      fallback: Option[StructType] = Some(DefaultEventSchema)): StructType = {
    val r = spark.read
    try glob.fold(r)(g => r.option("pathGlobFilter", g)).parquet(dir).schema
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if fallback.isDefined &&
            (e.getMessage.contains("Unable to infer schema") ||
              e.getMessage.contains("Path does not exist") ||
              e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) =>
        fallback.get
    }
  }
}

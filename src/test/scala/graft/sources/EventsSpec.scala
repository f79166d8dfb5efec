package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The type-probing events reader: the driver has shipped `events.ts` as
  * INT64 TIMESTAMP(NANOS) (readable as long under `nanosAsLong`) and as
  * TIMESTAMP(MICROS) across rounds, and the round-9 q8/q24 regression came
  * from hardcoding one contract. Every branch is pinned here.
  */
class EventsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("timestamp ts (the current driver contract) passes through as event_time") {
    val dir = tmpDir("graft_events_us")
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:15:30"), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.read(spark, dir)
    assert(got.schema("event_time").dataType == TimestampType)
    val row = got.select(col("event_time").cast("string")).head()
    assert(row.getString(0) == "2024-03-01 10:15:30")
  }

  test("long ts takes the legacy nanos branch") {
    val dir = tmpDir("graft_events_ns")
    val nanos = 1700000000123456789L // 2023-11-14T22:13:20.123456789Z
    Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.read(spark, dir)
    assert(got.schema("event_time").dataType == TimestampType)
    val micros = got.select(unix_micros(col("event_time"))).head().getLong(0)
    assert(micros == nanos / 1000L, s"nanos must truncate to micros, got $micros")
  }

  test("an undecodable ts type fails loudly, not silently") {
    val df = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Events.withEventTime(df))
    assert(e.getMessage.contains("ts must be"))
  }

  test("probeSchema respects the glob and reports the file's real types") {
    // the driver ships FLAT files (events.parquet is a file, not a
    // directory) — mirror that: write to staging, copy one part file in
    val dir = tmpDir("graft_events_mix")
    def flatten(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val staging = tmpDir("graft_events_staging")
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/$name"))
      ()
    }
    flatten(Seq((1L, 5L)).toDF("event_id", "ts"), "events.parquet")
    flatten(Seq(("decoy", 1.0)).toDF("a", "b"), "other.parquet")
    val schema = Events.probeSchema(spark, dir, glob = Some("events.parquet"))
    assert(schema("ts").dataType == LongType)
    assert(!schema.fieldNames.contains("a"), "the glob must exclude the decoy")
  }

  test("probeSchema on an empty directory falls back to the declared schema") {
    // cold-start: a stream is defined before the first file drop lands
    val dir = tmpDir("graft_events_empty")
    val schema = Events.probeSchema(spark, dir, glob = Some("events.parquet"))
    assert(schema == Events.DefaultEventSchema)
    assert(schema("ts").dataType == TimestampNTZType)
  }

  test("probeSchema on a nonexistent directory falls back too") {
    val schema = Events.probeSchema(spark, tmpDir("graft_events_gone") + "/never-written")
    assert(schema == Events.DefaultEventSchema)
  }

  test("probeSchema with fallback=None keeps strict probe-or-throw behavior") {
    val dir = tmpDir("graft_events_strict")
    intercept[org.apache.spark.sql.AnalysisException] {
      Events.probeSchema(spark, dir, fallback = None)
    }
  }

  test("probeSchema prefers the probed file type over the fallback once data exists") {
    // the fallback declares TIMESTAMP_NTZ; a legacy long-nanos file must win
    val dir = tmpDir("graft_events_probe_wins")
    Seq((1L, 1700000000123456789L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val schema = Events.probeSchema(spark, s"$dir/events.parquet")
    assert(schema("ts").dataType == LongType)
  }

  test("eventStream can be defined against a not-yet-populated directory") {
    // defining the stream must not throw; rows arriving later still flow
    val dropDir = tmpDir("graft_events_cold_stream")
    val events = graft.streaming.Streams.eventStream(spark, dropDir)
    assert(events.isStreaming)
    assert(events.schema("event_time").dataType == TimestampType)
    // now land a drop matching the declared contract and run one batch
    Seq((1L, java.time.LocalDateTime.parse("2024-03-01T10:15:30"), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dropDir)
    val sink = tmpDir("graft_events_cold_sink")
    val q = events.writeStream
      .format("memory").queryName("cold_start_events")
      .option("checkpointLocation", s"$sink/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("cold_start_events")
      .select(col("event_time").cast("string")).collect().map(_.getString(0))
    assert(got.sameElements(Array("2024-03-01 10:15:30")))
  }

  test("the real driver testdata decodes day-for-day with DuckDB's CAST(ts AS DATE)") {
    // the q8 contract at its smallest: event_time's DATE matches the raw
    // wall-clock date for every row (UTC session, SparkSpec config)
    val got = Events.read(spark, "/root/testdata/sf0.001")
      .filter(col("event_time").cast("date").cast("string")
        =!= substring(col("ts").cast("string"), 1, 10))
      .count()
    assert(got == 0L, "event_time date must equal ts's wall-clock date")
  }
}

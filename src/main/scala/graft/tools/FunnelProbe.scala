package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured evidence that the event-analytics layer holds at hot-key
  * scale (README "Scale design"): one BOT user holding `botEvents` events
  * (telemetry loops, scrapers — every real event stream has one) next to
  * `nUsers` normal users.
  *
  * [[graft.operators.Funnel.topPaths]] selects each user's first-k events
  * with the bounded [[graft.operators.FirstKAggregator]] — the bot costs
  * its scan and a <= 2k-element aggregation buffer. The two naive
  * formulations it replaces both concentrate the bot's entire history:
  *   - window `row_number() OVER (PARTITION BY user ORDER BY ts, type)`
  *     sorts all botEvents rows in ONE task (timed here — the q109 oracle
  *     replay shape, correct but hot-key-bound);
  *   - `collect_list` holds all botEvents elements in ONE aggregation
  *     buffer (~60 B/element => multi-GB at a 10M-event bot; printed as
  *     math, not run — the OOM leg proves nothing by crashing).
  * [[graft.operators.Funnel.chains]] is also timed: its per-step min-ts
  * scalars never materialize the bot's history anywhere.
  *
  * Both path legs are asserted identical row for row.
  *
  * Run: sbt "runMain graft.tools.FunnelProbe [botEvents] [nUsers] [maxSteps] [k]"
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val botEvents = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nUsers = args.lift(1).map(_.toLong).getOrElse(100000L)
    val maxSteps = args.lift(2).map(_.toInt).getOrElse(5)
    val k = args.lift(3).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic corpus: the bot (user 0) fires an event every ms,
    // normal users fire 10 events each at distinct timestamps; types
    // cycle view/click/purchase by exact integer arithmetic
    val types = array(lit("view"), lit("click"), lit("purchase"))
    val bot = spark.range(botEvents).select(
      lit(0L).as("user_id"), col("id").as("ts_ms"),
      element_at(types, (pmod(col("id"), lit(3L)) + 1).cast("int")).as("event_type"))
    val normal = spark.range(nUsers * 10).select(
      (col("id") % nUsers + 1L).as("user_id"),
      (col("id") * 7L).as("ts_ms"),
      element_at(types, (pmod(xxhash64(col("id")), lit(3L)) + 1).cast("int"))
        .as("event_type"))
    val events = bot.unionAll(normal).localCheckpoint(true)
    println(s"[probe] ${botEvents + nUsers * 10} events; bot user holds " +
      f"$botEvents%,d (${100.0 * botEvents / (botEvents + nUsers * 10)}%.0f%% of the stream)")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val bounded = time(s"topPaths bounded FirstK (buffer <= ${2 * maxSteps} elems)") {
      graft.operators.Funnel.topPaths(events, "user_id", "ts_ms", "event_type",
        maxSteps, k).collect().sortBy(_.getLong(2)).toSeq
    }
    val windowed = time(s"window row_number leg (one task sorts the bot's $botEvents rows)") {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_type"))
      events.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= maxSteps)
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_list(struct(col("rn"), col("event_type"))))
          .getField("event_type"), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path").asc).limit(k)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("n_users").desc, col("path").asc)).cast("long"))
        .collect().sortBy(_.getLong(2)).toSeq
    }
    require(bounded == windowed,
      s"legs diverged: ${bounded.take(3)} vs ${windowed.take(3)}")
    println(s"[probe] legs agree on ${bounded.size} paths; collect_list leg NOT run: " +
      f"its single aggregation buffer would hold $botEvents%,d elements " +
      f"(~${botEvents * 60 / 1e9}%.1f GB at ~60 B/elem) vs FirstK's ${2 * maxSteps}")

    time("funnel chains (per-step min-ts scalars, no history materialized)") {
      graft.operators.Funnel.chains(events, "user_id", "ts_ms", "event_type",
        Seq("view", "click", "purchase")).write.mode("overwrite")
        .format("noop").save()
    }
    spark.stop()
  }
}

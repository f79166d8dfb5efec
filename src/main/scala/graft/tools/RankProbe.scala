package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured evidence for the q119 design claim: per-key percent ranks via
  * the value-domain HISTOGRAM (one row per distinct (key, metric) through
  * the only window; data rows re-join their rank by (key, metric)) vs the
  * ANSI `percent_rank() OVER (PARTITION BY key ORDER BY metric)` window,
  * which funnels each key's ENTIRE row set through one sort task — the
  * [[VocabProbe]] trap, rank edition. Quantile normalization runs over
  * per-SOURCE partitions in a mixing pipeline, and sources are few and
  * huge — exactly the worst case for the window form.
  *
  * The probe builds `rows` rows across `nKeys` keys over a `domain`-sized
  * integer metric domain (the token-count/quality-score regime), runs
  * both formulations to identical results, and prints the funnel math
  * plus wall time.
  *
  * Run: sbt "runMain graft.tools.RankProbe [rows] [nKeys] [domain]"
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nKeys = args.lift(1).map(_.toInt).getOrElse(2)
    val domain = args.lift(2).map(_.toLong).getOrElse(10000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(rows).select(col("id"),
      concat(lit("k"), pmod(col("id"), lit(nKeys.toLong))).as("k"),
      pmod(xxhash64(col("id")), lit(domain)).as("v"))
      .localCheckpoint(true)
    println(f"[probe] $rows%,d rows, $nKeys keys, $domain%,d distinct metric values" +
      f" — window form sorts ${rows / nKeys}%,d rows in ONE task per key," +
      f" histogram form sorts <= $domain%,d")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // checksum instead of collect: 20M result rows would bottleneck on the
    // driver, not the formulation under test. Quantize BEFORE summing — a
    // double Σpr is partition-order dependent (non-associative addition
    // once disagreed in the 10th decimal on identical prs); a long sum of
    // per-row ppm-rounded values is exact and order-free (1e6 x 20M rows
    // stays far under Long.MaxValue; 1e12 overflowed)
    def sum64(dfr: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = dfr.agg(count(lit(1)),
        sum(round(col("pr") * 1000000L).cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val hist = time("histogram form (graft.operators.Stats.percentRanks)") {
      sum64(graft.operators.Stats.percentRanks(df, "id", "k", "v"))
    }
    val win = time("ANSI window form (percent_rank over full key rows)") {
      sum64(df.withColumn("pr",
        percent_rank().over(Window.partitionBy(col("k")).orderBy(col("v")))))
    }
    require(hist == win, s"formulations diverged: $hist vs $win")
    println(s"[probe] identical: ${hist._1} rows, Σpr = ${hist._2}")
    spark.stop()
  }
}

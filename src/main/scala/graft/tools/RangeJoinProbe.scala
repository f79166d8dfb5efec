package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the RangeJoin design claim: bucket-and-verify's
  * candidate volume tracks OUTPUT volume, while the naive equi-join on the
  * key alone funnels every per-key pair through the range filter —
  * quadratic in events-per-key, the term that detonates at 100 TB where a
  * hot key carries millions of events.
  *
  * Run: sbt "runMain graft.tools.RangeJoinProbe [sfDir] [deltaMs]"
  * Prints [probe]-prefixed lines: true pairs, candidate rows entering the
  * exact verify on each path, and wall time per path.
  */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val delta = args.lift(1).map(_.toLong).getOrElse(3600000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = graft.sources.Events.read(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("event_time")).as("ts_ms"))
      .cache()
    val nEvents = ev.count() // materialize the cache so both legs read RAM

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // candidate volume entering the exact verify, per path (plan math, no
    // timing): naive = all same-key ordered pairs; bucketed = same-key
    // adjacent-bucket ordered pairs
    val naiveCand = ev.groupBy(col("user_id")).count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)
    // the operator's own candidate construction (3-bucket probe explode
    // against the single-bucket build side), minus the exact verify
    val mod = (col("ts_ms") % delta + delta) % delta
    val fd = ((col("ts_ms") - mod) / delta).cast("long")
    val build = ev.select(col("user_id"), col("event_id"), fd.as("_b"))
    val probe = ev.select(col("user_id"), col("event_id").as("_pid"),
      explode(array(fd - 1, fd, fd + 1)).as("_b"))
    val bucketCand = probe.join(build, Seq("user_id", "_b"))
      .filter(col("_pid") < col("event_id")).count()

    // timed legs (warm cache, 2 runs each, min)
    def runBucketed(): Long = graft.operators.RangeJoin
      .selfWithin(ev, "user_id", "event_id", "ts_ms", delta).count()
    def runNaive(): Long = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.ts_ms") - col("b.ts_ms")) <= delta)
      .count()
    val warm = (runBucketed(), runNaive())
    val (nb, tb) = Seq.fill(2)(time(runBucketed())).minBy(_._2)
    val (nn, tn) = Seq.fill(2)(time(runNaive())).minBy(_._2)
    require(nb == nn && nb == warm._1 && nn == warm._2,
      s"paths disagree: bucketed=$nb naive=$nn")

    println(s"[probe] range join: $nEvents events, delta=${delta}ms, " +
      s"$nb true pairs")
    println(f"[probe] candidates into exact verify: naive=$naiveCand%,d, " +
      f"bucketed=$bucketCand%,d (${naiveCand.toDouble / math.max(bucketCand, 1)}%.1fx fewer)")
    println(f"[probe] wall: naive=$tn%.2fs, bucketed=$tb%.2fs " +
      f"(${tn / tb}%.1fx)")

    // HOT-KEY leg — the 100 TB failure mode: one entity carrying the whole
    // feed. Collapse every event onto a single key; the naive path funnels
    // n^2/2 pairs through the verify, the bucketed path only pairs within
    // adjacent delta-windows (dense output is paid for either way — the
    // waste is the candidate term).
    val hot = ev.select(lit(0L).as("user_id"), col("event_id"), col("ts_ms"))
      .cache()
    hot.count()
    def runHotBucketed(): Long = graft.operators.RangeJoin
      .selfWithin(hot, "user_id", "event_id", "ts_ms", delta).count()
    def runHotNaive(): Long = hot.as("a").join(hot.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.ts_ms") - col("b.ts_ms")) <= delta)
      .count()
    val (hb, thb) = time(runHotBucketed())
    val (hn, thn) = time(runHotNaive())
    require(hb == hn, s"hot-key paths disagree: bucketed=$hb naive=$hn")
    println(f"[probe] hot key (all $nEvents%,d events on ONE key): " +
      f"$hb%,d true pairs; wall naive=$thn%.2fs, bucketed=$thb%.2fs " +
      f"(${thn / thb}%.1fx)")
    spark.stop()
  }
}

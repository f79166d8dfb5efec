package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the q137 design claim: the two-pass Misra–Gries
  * heavy-hitters path ([[graft.operators.HeavyHitters]]) shuffles
  * `partitions x k` sketch counters + `<= k` candidate counts, while the
  * naive `GROUP BY item HAVING count(*) > phi*n` shuffles one row per
  * DISTINCT item — a key universe that GROWS with the corpus (token
  * bigrams, URLs: billions at 100 TB). The sketch pays a second scan of
  * the source; the naive form pays a corpus-sized exchange. This probe
  * quantifies the trade on a Zipf-ish stream whose distinct universe is
  * millions while its heavy-hitter set is tiny.
  *
  * Items: `rows` draws where item i is `xxhash64(id) % (id-dependent
  * stretch)` shaped so ~half the mass lands on `nHot` hot items and the
  * rest spreads over `universe` distinct tails. Both formulations run to
  * identical result sets before timing is believed.
  *
  * Run: sbt "runMain graft.tools.HeavyProbe [rows] [universe] [nHot]"
  */
object HeavyProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val universe = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val nHot = args.lift(2).map(_.toLong).getOrElse(50L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // half the draws hit one of nHot hot items, half spread over the
    // universe: hot items are ~rows/(2*nHot) each, tails ~rows/(2*universe)
    val df = spark.range(rows).select(
      when(pmod(xxhash64(col("id")), lit(2L)) === 0L,
        concat(lit("hot"), pmod(xxhash64(col("id"), lit(1)), lit(nHot))))
        .otherwise(
          concat(lit("t"), pmod(xxhash64(col("id"), lit(2)), lit(universe))))
        .as("item"))
      .localCheckpoint(true)

    val minFrac = 1.0 / (4.0 * nHot) // hot ~ rows/(2 nHot) > rows/(4 nHot) > any tail
    println(f"[probe] $rows%,d rows, ~$universe%,d distinct tails + $nHot hot" +
      f" items, minFrac=$minFrac%.6f (sketch k=${math.ceil(1 / minFrac).toLong})")

    // the scale claim is EXCHANGE volume, not local CPU: count shuffle
    // records/bytes per formulation alongside wall time
    val shufRecs = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics.shuffleWriteMetrics
        shufRecs.addAndGet(m.recordsWritten)
        shufBytes.addAndGet(m.bytesWritten)
      }
    })

    def time[T](label: String)(f: => T): T = {
      Thread.sleep(1000) // drain listener events from the previous phase
      val r0 = (shufRecs.get, shufBytes.get)
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[probe] $label: $secs%.2f s, shuffled ${shufRecs.get - r0._1}%,d" +
        f" records / ${(shufBytes.get - r0._2) / 1048576.0}%.1f MiB")
      r
    }

    val sketch = time("two-pass Misra-Gries (graft.operators.HeavyHitters)") {
      graft.operators.HeavyHitters.heavyHitters(df, col("item"), minFrac)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val naive = time("naive GROUP BY ... HAVING (full-universe shuffle)") {
      val n = df.count()
      df.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt").cast("double") > lit(minFrac * n.toDouble))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    require(sketch == naive,
      s"formulations diverged: ${sketch.size} vs ${naive.size} items")
    println(s"[probe] identical: ${sketch.size} heavy hitters, " +
      s"max cnt ${sketch.values.max}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the hashed, size-gated benchmark-gram join in
  * [[graft.operators.Curation.decontaminate]] (README "Scale design"):
  * the join side carries 8-byte xxhash64 values instead of gram strings,
  * and the explicit broadcast hint applies only under
  * `maxBroadcastGrams` — past it the join falls back to an AQE-planned
  * shuffle instead of OOMing the driver on a full eval-suite union.
  *
  * The probe runs the q41 construction (documents split 49:1 into
  * corpus/benchmark) on SPARK_GRAFT_SF_DIR, printing:
  *   - the benchmark's distinct-gram count, its payload bytes as strings
  *     (what an unhashed join would broadcast) vs hashed (8 B/gram);
  *   - wall time of the broadcast leg vs the forced shuffled-fallback leg
  *     (cap=0 + autoBroadcastJoinThreshold=-1), with identical outputs
  *     asserted row for row.
  *
  * Run: sbt "runMain graft.tools.DecontamProbe"
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)

    val gramStats = bench
      .select(explode(graft.operators.Curation.tokenNgrams(col("text"), 8)).as("gram"))
      .distinct()
      .agg(count(lit(1)).as("n"), sum(length(col("gram"))).as("strBytes"))
      .head()
    val (nGrams, strBytes) = (gramStats.getLong(0), gramStats.getLong(1))
    println(f"[probe] bench grams: $nGrams%,d distinct; " +
      f"string payload ${strBytes / 1e6}%.1f MB vs hashed ${nGrams * 8 / 1e6}%.1f MB " +
      f"(${strBytes.toDouble / (nGrams * 8)}%.1f x slimmer)")

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
      Thread.sleep(1000)
      val r0 = (shufRecs.get, shufBytes.get)
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[probe] $label: $secs%.2f s, shuffled ${shufRecs.get - r0._1}%,d" +
        f" records / ${(shufBytes.get - r0._2) / 1048576.0}%.1f MiB")
      r
    }
    val hinted = time("broadcast leg (default cap)") {
      graft.operators.Curation.decontaminate(corpus, bench, "doc_id", "text")
        .collect().sortBy(_.getLong(0)).toSeq
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fallback = time("shuffled fallback leg (cap=0, auto-broadcast off)") {
      graft.operators.Curation.decontaminate(corpus, bench, "doc_id", "text",
          maxBroadcastGrams = 0L)
        .collect().sortBy(_.getLong(0)).toSeq
    }
    require(hinted == fallback,
      s"fallback diverged: ${hinted.length} vs ${fallback.length} rows")
    // tier 3: same un-hinted worst case (cap=0, auto-broadcast off), but
    // the Bloom prefilter keeps corpus grams out of every exchange — only
    // survivors (true hits + fp trickle) move. This is the leg that
    // decides the contest once the eval suite outgrows the exact
    // broadcast: tier 2's exchange is CORPUS-sized, tier 3's is
    // contamination-sized.
    val bloom = time("bloom tier, same worst case (prefilter + exact verify)") {
      graft.operators.Curation.decontaminateBloom(corpus, bench,
          "doc_id", "text", maxBroadcastGrams = 0L)
        .collect().sortBy(_.getLong(0)).toSeq
    }
    require(hinted == bloom,
      s"bloom tier diverged: ${hinted.length} vs ${bloom.length} rows")
    println(s"[probe] legs agree on ${hinted.length} rows, " +
      s"${hinted.count(_.getBoolean(2))} contaminated")
    spark.stop()
  }
}

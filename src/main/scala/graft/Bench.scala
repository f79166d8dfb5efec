package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Each query is forced end-to-end with a noop-format write (a plain count()
  * would let Catalyst prune the expensive projections out of the plan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.windows.muteNoPartitionWarning() // all global windows here are bounded

    // one warm-up pass of the flagship to absorb JVM/codegen warm-up
    try SparkEntry.queries("q11_knn_cosine")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_RUNS timed runs per query (default 3), report the
    // min: the first run absorbs plan-compilation + page-cache effects, the
    // extra runs damp co-located-load noise (a single-shot bench once
    // recorded a phantom +24% round-over-round), and a GC between queries
    // keeps one query's garbage from billing the next (local single-JVM).
    // optional positional args: run only the named queries (local iteration)
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val only = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
        s"valid: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.filter(q => only(q._1)).toSeq
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      System.gc()
      name -> Seq.fill(nRuns)(once()).min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // ALSO persist the full line: the driver captures only the tail of
    // stdout, so at 100+ queries the printed line gets beheaded in the
    // round artifact (BENCH_r11 lost 35/109 timings). The repo file is the
    // durable copy; round-over-round comparison reads it, not stdout.
    if (only.isEmpty) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

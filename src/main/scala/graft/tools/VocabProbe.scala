package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured evidence for the q90 design claim: per-key vocabulary top-k
  * via the bounded [[graft.operators.TopKTokenAggregator]] partial-
  * aggregates (each map task emits <= k rows per key into the final
  * shuffle), while the window-rank formulation funnels every key's ENTIRE
  * vocabulary through one task — the term that detonates at 100 TB, where
  * web-scale junk vocabulary (ids, misspellings, boilerplate mutations)
  * grows with the corpus into billions of distinct tokens.
  *
  * The probe builds a deterministic synthetic corpus (nKeys languages,
  * `vocab` distinct tokens each, uniform instances) sized so the
  * per-key vocabulary dwarfs k, runs both formulations to identical
  * results, and prints candidate-volume math plus wall time.
  *
  * Run: sbt "runMain graft.tools.VocabProbe [rows] [vocabPerKey] [nKeys] [k]"
  */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val vocab = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val nKeys = args.lift(2).map(_.toInt).getOrElse(4)
    val k = args.lift(3).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic corpus: token instance i belongs to key (i mod nKeys)
    // and spells token "w" + (xxhash64(i) mod vocab) — uniform frequencies,
    // ties resolved by the contract's token-asc order on both paths
    val corpus = spark.range(rows).select(
      concat(lit("k"), pmod(col("id"), lit(nKeys.toLong))).as("key"),
      concat(lit("w"), pmod(xxhash64(col("id")), lit(vocab))).as("token"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // the (key, token, cnt) reduction is IDENTICAL in both formulations
    // (one partial-aggregated shuffle) — cache it so the probe times the
    // stage where the designs actually differ: per-key top-k selection
    val counts = corpus
      .groupBy(col("key"), col("token")).agg(count(lit(1)).as("cnt"))
      .cache()
    val distinctPerKey = counts.groupBy(col("key")).count()
      .agg(max(col("count"))).head().getLong(0) // also materializes the cache
    val mapParts = spark.sparkContext.defaultParallelism

    val topk = udaf(new graft.operators.TopKTokenAggregator(k))
    def runAgg() = counts
      .groupBy(col("key")).agg(topk(col("cnt"), col("token")).as("topk"))
      .select(col("key"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("key"), col("hit.token").as("token"), col("hit.cnt").as("cnt"),
        (col("pos") + 1).cast("long").as("rnk"))
      .collect().sortBy(r => (r.getString(0), r.getLong(3)))

    def runWindow() = counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("key"))
          .orderBy(col("cnt").desc, col("token").asc)).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("key"), col("token"), col("cnt"), col("rnk"))
      .collect().sortBy(r => (r.getString(0), r.getLong(3)))

    val warm = (runAgg(), runWindow())
    require(warm._1.map(_.toString).toSeq == warm._2.map(_.toString).toSeq,
      "paths disagree on the top-k result")
    val (_, ta) = Seq.fill(2)(time(runAgg())).minBy(_._2)
    val (_, tw) = Seq.fill(2)(time(runWindow())).minBy(_._2)

    println(f"[probe] vocab top-k: $rows%,d token instances, $nKeys keys, " +
      f"~$distinctPerKey%,d distinct tokens/key, k=$k")
    println(f"[probe] rows into the per-key stage: window=$distinctPerKey%,d " +
      f"per key through ONE task; aggregator<=${mapParts.toLong * k}%,d per key " +
      f"(${distinctPerKey.toDouble / (mapParts.toLong * k)}%.0fx fewer)")
    println(f"[probe] wall: window=$tw%.2fs, aggregator=$ta%.2fs (${tw / ta}%.1fx)")
    spark.stop()
  }
}

package graft.tools

import graft.sources.{StoreConfig, VectorStoreCatalog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-shaped demo: drive [[VectorStoreCatalog.query]] (the
  * reference's single-query serving surface, with its index-selection and
  * exact-fallback semantics) at thread concurrency against a warm store +
  * warm IVF index, and report QPS / latency percentiles — the closest
  * honest analog to the reference's headline serving table
  * (README.md:63's QPS rows).
  *
  * CLEARLY LABELED CAVEAT: this is a BATCH ENGINE doing serving. Every
  * query is a full Spark job — plan, schedule, run tasks, collect k rows —
  * so per-query latency floors at driver/scheduler overhead (milliseconds)
  * no matter how small the data; the reference is an in-process RAM engine
  * with none of that floor. The number this probe defends is "a shared
  * catalog can absorb interactive lookups while remaining a batch engine",
  * not "this is a serving system". Concurrent threads share the one
  * SparkContext (thread-safe by design; FAIR scheduling keeps queries from
  * convoying behind each other).
  *
  * Usage: `runMain graft.tools.ServingProbe [nThreads] [queriesPerThread]
  * [useIndex]` (defaults 8, 25, true). Reads
  * `SPARK_GRAFT_SF_DIR` (default sf0.001) for the embeddings table.
  */
object ServingProbe {
  def main(args: Array[String]): Unit = {
    val nThreads = args.headOption.map(_.toInt).getOrElse(8)
    val perThread = args.drop(1).headOption.map(_.toInt).getOrElse(25)
    val useIndex = args.drop(2).headOption.forall(_.toBoolean)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_serving").toString
    val catalog = new VectorStoreCatalog(spark, root)
    catalog.create("probe", "serve", StoreConfig(dimension = 64,
      indexType = if (useIndex) "ivf" else "flat"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    catalog.addVectors("probe", "serve", emb.select(
      $"embedding".as("vector"),
      map(lit("vec_id"), $"vec_id".cast("string")).as("meta")))
    if (useIndex) catalog.buildIndex("probe", "serve", nLists = 16)
    val queryVecs = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    val nStored = catalog.count("probe", "serve")
    println(s"[probe] === serving-shaped: $nStored vectors, " +
      s"$nThreads threads x $perThread queries, useIndex=$useIndex ===")

    def once(i: Int): Double = {
      val t0 = System.nanoTime()
      val rows = catalog.query("probe", "serve",
        queryVecs(i % queryVecs.length), k = 10, useIndex = useIndex).collect()
      require(rows.length == 10, s"query $i returned ${rows.length} rows")
      (System.nanoTime() - t0) / 1e6
    }
    // warm both the store scan and the index before timing
    (0 until 3).foreach(once)

    val lat = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val t0 = System.nanoTime()
    val threads = (0 until nThreads).map { t =>
      new Thread(() =>
        (0 until perThread).foreach(i => lat.add(once(t * perThread + i))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val sorted = lat.asScala.toArray.sorted
    def pct(p: Double): Double = sorted((p * (sorted.length - 1)).round.toInt)
    val total = nThreads * perThread
    val qps = total / wall
    println(f"[probe] $total queries in $wall%.1f s -> $qps%.1f QPS | " +
      f"latency ms p50 ${pct(0.50)}%.1f p90 ${pct(0.90)}%.1f " +
      f"p99 ${pct(0.99)}%.1f max ${sorted.last}%.1f")
    println(f"""{"probe":"serving","n_vectors":$nStored,"threads":$nThreads,"queries":$total,"use_index":$useIndex,"qps":$qps%.1f,"p50_ms":${pct(0.50)}%.1f,"p90_ms":${pct(0.90)}%.1f,"p99_ms":${pct(0.99)}%.1f}""")
    spark.stop()
  }
}

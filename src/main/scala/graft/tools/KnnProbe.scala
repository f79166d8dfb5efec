package graft.tools

import graft.operators.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Blocked-vs-expression batch-kNN throughput probe at real kernel scale
  * (default 100k x 384-d store, 64 queries) — the sf0.1 bench store (5k x 64)
  * is job-overhead-dominated, so the 2x bar against the reference's batch
  * matmul is measured here instead. Prints [probe] lines and a final JSON.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val d = args.lift(1).map(_.toInt).getOrElse(384)
    val m = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // seeded synthetic store; pinned so both paths score identical data
    val store = spark.range(n).select(col("id"),
        transform(sequence(lit(1), lit(d)),
          i => (rand(42) * 2 - 1).cast("float")).as("vector"))
      .localCheckpoint(true)
    val queries = store.filter(col("id") < m)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint(true)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, f: => org.apache.spark.sql.DataFrame): Double = {
      val warm = time(f.write.mode("overwrite").format("noop").save())
      val t = math.min(warm, time(f.write.mode("overwrite").format("noop").save()))
      println(f"[probe] $label: $t%.3f s (${m.toLong * n / t / 1e6}%.1f M scores/s)")
      t
    }

    val tExpr = run("expression path", Knn.batchTopK(queries, store, k = 10))
    val tBlocked = run("blocked gemm  ", Knn.batchTopKBlocked(queries, store, k = 10))
    println(f"""{"probe":"knn_100k","n":$n,"d":$d,"m":$m,"expr_sec":$tExpr%.3f,"blocked_sec":$tBlocked%.3f,"ratio":${tExpr / tBlocked}%.2f}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for where [[graft.ml.RandomProjection]] sits in the
  * embedding stack (README "Scale design") — including its honest
  * boundary. The corpus is twin-groups of 8 (each vector has 7 TRUE
  * near neighbors at noise-scale distance and strangers at O(1)) — the
  * near-dup-mining workload RP candidates actually serve; per
  * (dOut, over-fetch) cell the probe measures:
  *   - twin purity of the re-ranked top-10 (did the candidates contain
  *     the planted neighbors — the recoverable 8 of 10 slots);
  *   - recall@10 vs full-dim exact truth after an exact full-dim re-rank
  *     of the RP candidates.
  * The boundary, measured on an earlier iid-noise-cluster corpus: when
  * within-cluster gaps are pure noise, NO compression ranks them (recall
  * ~0.17 at dOut=16 and dOut=32 alike, purity 1.0) — RP preserves real
  * gaps, not noise orderings, which is why exact re-ranking stays
  * downstream of it everywhere in this engine.
  *
  * Run: sbt "runMain graft.tools.RpProbe [nVectors] [nQueries]"
  */
object RpProbe {
  def main(args: Array[String]): Unit = {
    val nVectors = args.headOption.map(_.toLong).getOrElse(200000L)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // twin-group corpus: ids i share a micro-center with the 7 other
    // members of group floor(i/8), plus tiny noise — every vector has 7
    // TRUE near neighbors at noise-scale distance and 200k strangers at
    // O(1) distance. This is the engine's actual RP workload shape
    // (near-dup mining / SemDeDup), where neighbor gaps are real; a
    // cluster-of-iid-noise corpus has no recoverable ranking for ANY
    // sketch to find. Everything derives from xxhash64 (deterministic).
    val dIn = 64
    val group = col("id").divide(lit(8L)).cast("long")
    val base = spark.range(nVectors).select(col("id"),
      transform(sequence(lit(0), lit(dIn - 1)), j =>
        (pmod(xxhash64(group, j), lit(1000L)).cast("double") / 500.0 - 1.0) +
          (pmod(xxhash64(col("id"), j, lit(7)), lit(100L)).cast("double") / 1000.0 - 0.05))
        .cast("array<float>").as("vec"))
      .localCheckpoint(true)
    println(f"[probe] $nVectors%,d vectors x $dIn d in twin-groups of 8, " +
      f"$nQueries queries, k=10")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val queries = base.filter(col("id") < nQueries)
      .select(col("id").as("query_id"), col("vec").as("query_vec"))
      .localCheckpoint(true)
    val store = base.select(col("id"), col("vec").as("vector"))

    val exact = time("full-dim exact batch kNN (truth)") {
      graft.operators.Knn.batchTopKBlocked(queries, store, k = 10)
        .select("query_id", "id").localCheckpoint(true)
    }

    for (dOut <- Seq(16, 32)) {
      val rp = time(s"RP $dIn->$dOut projection of the corpus") {
        graft.ml.RandomProjection.project(base, "id", "vec", dIn, dOut)
          .select(col("id"), col("proj").cast("array<float>").as("vec"))
          .localCheckpoint(true)
      }
      for (overFetch <- Seq(40, 200)) {
        val approx = time(s"RP$dOut top-$overFetch candidates + exact re-rank to top-10") {
          val qp = rp.filter(col("id") < nQueries)
            .select(col("id").as("query_id"), col("vec").as("query_vec"))
          val cands = graft.operators.Knn.batchTopKBlocked(qp,
            rp.select(col("id"), col("vec").as("vector")), k = overFetch)
            .select(col("query_id"), col("id"))
          // exact re-rank: full-dim cosine over the candidates only
          val withVecs = cands
            .join(store, Seq("id"))
            .join(broadcast(queries), Seq("query_id"))
          val scored = withVecs.select(col("query_id"), col("id"),
            graft.functions.vector.similarity(col("vector"), col("query_vec"),
              graft.functions.vector.MetricCosine).as("s"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id")).orderBy(col("s").desc, col("id").asc)
          scored.select(col("query_id"), col("id"),
              row_number().over(w).as("rnk"))
            .filter(col("rnk") <= 10).select("query_id", "id")
            .localCheckpoint(true)
        }
        val purity = approx
          .select((col("query_id").divide(lit(8L)).cast("long") ===
            col("id").divide(lit(8L)).cast("long"))
            .cast("long").as("same"))
          .agg(avg(col("same"))).head().getDouble(0)
        val rec = graft.ml.Recall.summarize(
          graft.ml.Recall.recallAtK(approx, exact)).head()
        println(f"[probe] dOut=$dOut overFetch=$overFetch: cluster purity " +
          f"$purity%.3f, exact-neighbor recall@10 ${rec.getDouble(2)}%.3f " +
          f"(${rec.getLong(0)}/${rec.getLong(1)} pairs)")
      }
    }
    spark.stop()
  }
}

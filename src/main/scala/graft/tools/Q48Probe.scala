package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing probe for the SimHash recall sweep (q48). */
object Q48Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("q48-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val copies = docs.select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val corpus = docs.unionAll(copies)
    val truth = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 100000).as("id_b"))

    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q48] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    for (round <- Seq("cold", "warm")) {
      println(s"[q48] === $round ===")
      for (nb <- Seq(2, 4, 8)) {
        val found = Dedup.nearDupPairsSimHash(
          corpus, "doc_id", "text", maxHamming = 3, nBands = nb,
          maxBucketSize = 1 << 20)
        timed(s"nb=$nb found count")(found.count())
        timed(s"nb=$nb pairRecall")(
          graft.ml.Recall.pairRecall(found, truth).head().getDouble(2))
      }
    }
    spark.stop()
  }
}

package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** End-to-end timing probe for the prefix-filtered Jaccard join (q37) —
  * run with SPARK_GRAFT_SF_DIR pointing at a testdata dir. Two timed runs:
  * the second shows the warm (bench-methodology) cost.
  */
object Q37Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("q37-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.nearDupPairsPrefix(docs, "doc_id", "text", 2, 0.7).count()
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
    }
    run("cold")
    run("warm")
    spark.stop()
  }
}

package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the shingle tokenization stage of the Jaccard join. */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("tok-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tok] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    println(s"[tok] input partitions: ${docs.rdd.getNumPartitions}")
    for (round <- Seq("cold", "warm")) {
      println(s"[tok] === $round ===")
      timed("docs count")(docs.count())
      timed("split only")(docs.select(explode(split(col("text"), " "))).count())
      timed("shingles n=2 no-distinct") {
        val toks = split(col("text"), " ")
        val n = 2
        val cnt = size(toks) - (n - 1)
        docs.select(explode(transform(sequence(lit(1), cnt),
          i => array_join(slice(toks, i, lit(n)), " ")))).count()
      }
      timed("shingles n=2 with array_distinct")(
        docs.select(explode(Dedup.tokenShingles(col("text"), 2))).count())
      timed("full toks + size + explode")(
        docs.select(col("doc_id").cast("long").as("id"),
            Dedup.tokenShingles(col("text"), 2).as("sh"))
          .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("tok"))
          .count())
      timed("same + localCheckpoint")(
        docs.select(col("doc_id").cast("long").as("id"),
            Dedup.tokenShingles(col("text"), 2).as("sh"))
          .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("tok"))
          .localCheckpoint(true).count())
      timed("repartition(32) first")(
        docs.repartition(32)
          .select(col("doc_id").cast("long").as("id"),
            Dedup.tokenShingles(col("text"), 2).as("sh"))
          .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("tok"))
          .count())
    }
    spark.stop()
  }
}

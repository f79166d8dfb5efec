package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-pipeline throughput probe at 20x the bench corpus (default 100k
  * docs, ~10% planted near-dups): times MinHash candidate generation +
  * exact-Jaccard verify + connected-component grouping end to end. The sf0.1
  * bench (5k docs) is overhead-dominated; this is the docs/sec evidence for
  * the 100x-scale story. Prints [probe] lines and a final JSON.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic corpus: 40-word docs over a 500-word vocab;
    // the last tenth of ids are near-copies of the first tenth (one word
    // appended), so ground-truth duplicate pairs are planted and countable
    val vocab = array((0 until 500).map(i => lit(s"w$i")): _*)
    def textFor(idCol: org.apache.spark.sql.Column) = array_join(
      transform(sequence(lit(1), lit(40)),
        p => element_at(vocab, pmod(hash(idCol * 1000 + p), lit(500)) + 1)), " ")
    val nPlanted = n / 10
    val docs = spark.range(n.toLong + nPlanted).select(
      col("id"),
      when(col("id") < n, textFor(col("id")))
        .otherwise(concat(textFor(col("id") - n), lit(" extra")))
        .as("text"))
      .localCheckpoint(true)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val total = n + nPlanted
    val (nPairs, tPairs) = time {
      Dedup.nearDupPairsMinHash(docs, "id", "text", threshold = 0.8).count()
    }
    println(f"[probe] near-dup pairs: $nPairs found in $tPairs%.1f s " +
      f"(${total / tPairs}%.0f docs/s); planted $nPlanted")
    val (nGroups, tGroups) = time {
      val pairs = Dedup.nearDupPairsMinHash(docs, "id", "text", threshold = 0.8)
      Dedup.dedupGroups(docs, pairs, "id")
        .filter(col("is_representative")).count()
    }
    println(f"[probe] grouping: $nGroups representatives in $tGroups%.1f s end-to-end")
    println(f"""{"probe":"dedup_100k","docs":$total,"planted":$nPlanted,"pairs":$nPairs,"pairs_sec":$tPairs%.1f,"group_sec":$tGroups%.1f,"docs_per_sec":${total / tPairs}%.0f}""")
    spark.stop()
  }
}

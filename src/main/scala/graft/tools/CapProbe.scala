package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the df/posting-cap lever on the pairwise text
  * operators (README "Scale design": "a boilerplate fingerprint present in
  * half the crawl costs its cap, not its df²").
  *
  * The probe builds a synthetic corpus where a FRACTION of documents share
  * one boilerplate sentence (the df² hot key — licenses, headers, cookie
  * banners at crawl scale) plus `nPairs` planted exact-dup pairs of unique
  * prose (the signal). It runs [[graft.operators.Dedup.winnowingPairs]]
  * uncapped and capped, printing the candidate volume (pair rows entering
  * the shared-count aggregation) and wall time, and asserting BOTH legs
  * find every planted pair — the cap only sheds boilerplate-driven
  * candidates, never unique-content matches (a planted pair's
  * fingerprints have df=2, far under any sane cap).
  *
  * Run: sbt "runMain graft.tools.CapProbe [nDocs] [boilerFrac] [nPairs] [cap]"
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val boilerFrac = args.lift(1).map(_.toDouble).getOrElse(0.1)
    val nPairs = args.lift(2).map(_.toInt).getOrElse(100)
    val cap = args.lift(3).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // unique prose: 12 tokens derived from the doc id (no cross-doc grams);
    // boilerplate docs append one shared 12-token sentence; planted pairs
    // duplicate the base doc's prose under id + nDocs
    val boiler = "this document is provided as is without warranty of any kind whatsoever"
    val base = spark.range(nDocs).select(col("id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("u"), col("id") * 12 + j)): _*).as("prose"),
      (pmod(xxhash64(col("id")), lit(1000000L)) <
        (boilerFrac * 1000000L).toLong).as("hasBoiler"))
    val docs0 = base.select(col("id"),
      when(col("hasBoiler"), concat(col("prose"), lit(" " + boiler)))
        .otherwise(col("prose")).as("text"))
    val dups = docs0.filter(col("id") < nPairs)
      .select((col("id") + nDocs).as("id"), col("text"))
    val docs = docs0.unionAll(dups).localCheckpoint(true)
    val nBoiler = docs.filter(col("text").contains("warranty")).count()

    def leg(tag: String, maxDocsPerFp: Int): Unit = {
      // candidate volume = pair rows entering the shared-count aggregation
      // == sum over fps of (docs-with-fp choose 2), capped per fp
      val fps0 = graft.operators.Dedup.winnowingFingerprints(
        docs, "id", "text")
      val fps = if (maxDocsPerFp == Int.MaxValue) fps0
        else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("fp")).orderBy(col("id"))
          fps0.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") <= maxDocsPerFp).drop("_rn")
        }
      val cand = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")))
        .head().getLong(0)
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.winnowingPairs(
          docs, "id", "text", minShared = 2, maxDocsPerFp = maxDocsPerFp)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      val nPairsOut = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // planted-pair recall checked distributed — an uncapped boilerplate
      // run emits tens of millions of junk pairs, far past a driver collect
      val spark2 = docs.sparkSession
      import spark2.implicits._
      val planted = (0 until nPairs).map(i => (i.toLong, (i + nDocs).toLong))
        .toDF("id_a", "id_b")
      val missed = planted.join(pairs, Seq("id_a", "id_b"), "left_anti").count()
      require(missed == 0, s"$tag: lost $missed planted pairs")
      println(f"[probe] $tag: candidates=$cand%,d pairs=$nPairsOut%,d " +
        f"wall=$wall%.2f s (all $nPairs planted found)")
    }

    println(f"[probe] corpus: ${docs.count()}%,d docs, $nBoiler%,d carry the " +
      f"boilerplate sentence, $nPairs planted dup pairs")
    leg(s"capped($cap)", cap)
    leg("uncapped", Int.MaxValue)
    spark.stop()
  }
}

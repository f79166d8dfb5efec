package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the prefix-filtered Jaccard join —
  * replicates nearDupPairsPrefix's pipeline with a count() barrier per stage
  * so each stage's cost lands in its own wall-clock bucket. Local iteration
  * tool only; the real operator stays in Dedup.
  */
object Q37Stages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("q37-stages")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- Seq("cold-l3", "warm-l3", "warm-l4", "warm-l6", "warm-l10")) {
      println(s"[stage] === $round ===")
      val lOverride = round.split("-l")(1).toInt
      val threshold = 0.7
      val toks = timed("toks checkpoint") {
        docs.repartition(32)
          .select(col("doc_id").cast("long").as("id"),
            Dedup.tokenShingles(col("text"), 2).as("sh"))
          .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("tok"))
          .localCheckpoint(true)
      }
      val dfAgg = timed("dfAgg checkpoint")(
        toks.groupBy("tok").agg(count(lit(1)).as("df")).localCheckpoint(true))
      val tokIds = timed("tokIds build") {
        spark.createDataFrame(
          dfAgg.sort(col("df"), col("tok"))
            .select(col("tok")).rdd
            .zipWithIndex.map { case (r, i) => (r.getString(0), i + 1L) })
          .toDF("tok", "tid")
      }
      timed("stats + l") {
        val stats = dfAgg.agg(count(lit(1)).as("vocab"), sum(col("df")).as("rows")).head()
        val avgDf = stats.getLong(1).toDouble / math.max(stats.getLong(0), 1L)
        if (avgDf <= 8) 3 else if (avgDf <= 64) 6 else 10
      }
      val l = lOverride
      println(s"[stage] l=$l")
      val docArrs = timed("docArrs checkpoint") {
        toks.join(tokIds, Seq("tok"))
          .groupBy(col("id"))
          .agg(sort_array(collect_list(col("tid"))).as("arr"))
          .select(col("id"), size(col("arr")).as("n"), col("arr"))
          .localCheckpoint(true)
      }
      val prefixes = docArrs.select(col("id"), col("n"),
          posexplode(slice(col("arr"), lit(1),
            (col("n") - ceil(col("n") * threshold) + l).cast("int"))))
        .select(col("id"), col("n"), (col("pos") + 1).as("pos"), col("col").as("tid"))
      println(s"[stage] prefixRows=${timed("prefix count")(prefixes.count())}")
      val alpha = threshold / (1 + threshold)
      val candidates = prefixes.as("x").join(prefixes.as("y"),
          col("x.tid") === col("y.tid") &&
            col("x.id") < col("y.id") &&
            least(col("x.n"), col("y.n")).cast("double") >=
              greatest(col("x.n"), col("y.n")) * threshold &&
            (lit(l) + least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos")))
              .cast("double") >= (col("x.n") + col("y.n")) * alpha)
        .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
          col("x.n").as("n_a"), col("y.n").as("n_b"))
        .agg(count(lit(1)).as("shared_prefix"))
        .filter(col("shared_prefix") >=
          least(lit(l), ceil(greatest(col("n_a"), col("n_b")) * threshold)))
        .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      val cached = timed("candidate join+agg checkpoint")(candidates.localCheckpoint(true))
      println(s"[stage] candidates=${cached.count()}")
      val verified = cached
        .join(docArrs.select(col("id").as("id_a"), col("arr").as("arr_a")), Seq("id_a"))
        .join(docArrs.select(col("id").as("id_b"), col("arr").as("arr_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("arr_a"), col("arr_b"))).as("inter"),
          col("n_a"), col("n_b"))
        .select(col("id_a"), col("id_b"),
          (col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      println(s"[stage] pairs=${timed("verify")(verified.count())}")
    }
    spark.stop()
  }
}

package graft.tools

import graft.ml.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the adaptive filtered-ANN plan choice
  * ([[graft.ml.IvfIndex.searchAdaptive]], q172), three selectivity
  * regimes:
  *
  *  - NEEDLE (matches << k): the fixed recipe underfills inside the
  *    probed lists and its defined fallback rescans the whole store —
  *    two passes. Adaptive counts first and runs ONE exact pre-filtered
  *    pass. On this flat-parquet layout the map-key filter cannot push
  *    to the scan, so wall time lands near parity (the count probe costs
  *    about what the avoided probe scan cost) — the honest number; the
  *    structural win is one pass, which grows with store width.
  *  - MID (k < matches, spread across all lists): the DANGEROUS regime —
  *    the fixed path fills k from the probed lists alone, so NO fallback
  *    triggers and recall silently drops to roughly the probe fraction.
  *    Adaptive plans prefilter_exact and recall is 1.0 by construction.
  *    This recall contrast is the planner's reason to exist.
  *  - BROAD (matches > preFilterCap): both plans take the probed path;
  *    adaptive pays only the count probe — the honest overhead row.
  *
  * Run: sbt "runMain graft.tools.FilterProbe [nVectors]"
  */
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 64-dim synth vectors; 5 'needle' rows, half 'par'=0 — the two
    // selectivity extremes the planner separates
    val needleEvery = math.max(n / 5, 1)
    val vecPath = java.nio.file.Files
      .createTempDirectory("graft_filterprobe").toString
    spark.range(n.toLong).select(col("id"),
        transform(sequence(lit(1), lit(64)), j =>
          (pmod(hash(col("id") * 131 + j), lit(1000)).cast("double") / 500.0
            - 1.0).cast("float")).as("vector"),
        map(
          lit("needle"),
          when(col("id") % needleEvery === 1, "y").otherwise("n"),
          lit("mid"), when(col("id") % 200 === 1, "y").otherwise("n"),
          lit("par"), (col("id") % 2).cast("string")).as("meta"))
      .write.mode("overwrite").parquet(vecPath)
    val vecs = spark.read.parquet(vecPath)

    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_filterprobe_ivf").toString
    val cents = vecs.filter(col("id") < 64).orderBy(col("id"))
      .select(col("vector")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val idx = IvfIndex.buildWithCentroids(vecs, "id", "vector", idxPath,
      cents)
    val qv = vecs.filter(col("id") === 1).select(col("vector")).head()
      .getSeq[Float](0).map(_.toDouble).toSeq

    def time(f: => Seq[Long]): (Seq[Long], Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(col("id")).collect().map(_.getLong(0)).toSeq.sorted

    // warm-up absorbs plan/codegen cost for both shapes
    idx.search(qv, 10, nProbe = 8, Map("par" -> "0")).collect()
    idx.searchAdaptive(qv, 10, nProbe = 8, Map("par" -> "0")).hits.collect()

    val (fixedNeedle, tFixN) = time(ids(
      idx.search(qv, 10, nProbe = 8, Map("needle" -> "y"))))
    val (adaptNeedle, tAdN) = time {
      val r = idx.searchAdaptive(qv, 10, nProbe = 8, Map("needle" -> "y"))
      require(r.path == IvfIndex.PathPrefilterExact && r.matches == 5,
        s"needle filter must plan prefilter_exact over 5, got ${r.path}/" +
          s"${r.matches}")
      ids(r.hits)
    }
    require(fixedNeedle == adaptNeedle,
      "both plans must return the identical (exact) needle result")

    // MID: enough matches to fill k inside the probed lists (no fallback
    // fires), so the fixed path's recall is whatever the probe width
    // buys — silently. Adaptive plans prefilter_exact, recall 1.0 at ANY
    // probe width. Sweep nProbe to show the dependence the planner
    // removes.
    val truthMid = ids(graft.operators.Knn.topK(
      vecs.filter(element_at(col("meta"), "mid") === "y"), qv, 10))
    val fixedMidRecall = Seq(1, 2, 4, 8).map { np =>
      val got = ids(idx.search(qv, 10, nProbe = np, Map("mid" -> "y")))
      np -> got.toSet.intersect(truthMid.toSet).size / 10.0
    }
    val adaptMidR = idx.searchAdaptive(qv, 10, nProbe = 8, Map("mid" -> "y"))
    require(adaptMidR.path == IvfIndex.PathPrefilterExact,
      s"mid filter must plan prefilter_exact, got ${adaptMidR.path}")
    val adaptMid = ids(adaptMidR.hits)
    val adaptRecall = adaptMid.toSet.intersect(truthMid.toSet).size / 10.0
    require(adaptRecall == 1.0,
      s"adaptive mid-selectivity recall must be exact, got $adaptRecall")

    val (fixedBroad, tFixB) = time(ids(
      idx.search(qv, 10, nProbe = 8, Map("par" -> "0"))))
    val (adaptBroad, tAdB) = time {
      val r = idx.searchAdaptive(qv, 10, nProbe = 8, Map("par" -> "0"))
      require(r.path == IvfIndex.PathIvfPostfilter,
        s"broad filter must plan ivf_postfilter, got ${r.path}")
      ids(r.hits)
    }
    require(fixedBroad == adaptBroad,
      "the broad plan is the same path either way")

    val midJson = fixedMidRecall
      .map { case (np, r) => f""""fixed_np$np":$r%.2f""" }.mkString(",")
    println(f"""{"probe":"filter","n":$n,"needle":{"fixed_sec":$tFixN%.2f,"adaptive_sec":$tAdN%.2f},"mid":{$midJson,"adaptive_recall":$adaptRecall%.2f,"matches":${adaptMidR.matches}},"broad":{"fixed_sec":$tFixB%.2f,"adaptive_sec":$tAdB%.2f}}""")
    spark.stop()
  }
}

package graft.tools

import graft.operators.{Dedup, FingerprintIndex, HammingIndex, HyperplaneIndex, SegmentIndex}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Scale sweep for ALL FIVE persisted dedup-index families — the
  * [[IngestProbe]] lesson (the indexed win only shows once the corpus
  * dwarfs the batch) applied across the board: for each corpus size,
  * build [[FingerprintIndex]] (MinHash), [[HammingIndex]] (SimHash),
  * [[SegmentIndex]] (paragraph hashes), [[HyperplaneIndex]] (embedding
  * LSH, at BOTH the default 64/8 geometry and the wide 128/8 — the
  * bucket-selectivity contrast) and [[graft.ml.SemDedupIndex]] (uniform
  * batch = pruning worst case, plus a cluster-skewed batch = the pruning
  * case the partitioned layout exists for) over the SAME materialized
  * corpus, then time one FIXED 10k batch-vs-corpus match on the indexed
  * path vs the honest no-index recompute path (re-read + re-fingerprint /
  * re-sign / re-assign the corpus parquet in memory — no throwaway index
  * write is charged to it). Both paths must agree on the matched-batch
  * count (asserted), so every ratio compares identical work.
  *
  * Corpus docs are paragraph-structured (8 x 25-word paragraphs, ~1 KB,
  * "\n"-joined) so the segment family gets a realistic hash-set size;
  * batch near-copies append one word, which keeps them inside
  * MinHash≥0.8 / SimHash hamming≤3 AND drops their unchanged paragraphs
  * as corpus dups. Usage:
  * `runMain graft.tools.IndexSweepProbe [n1 n2 ...]` (default
  * 25000 100000 400000). Prints [probe] lines + one JSON per scale.
  */
object IndexSweepProbe {
  def main(args: Array[String]): Unit = {
    // modes: (warm sweep default) | cold | cold_text | cold_embed | audio —
    // the splits let one leg re-run in isolation (arbitrating a suspect
    // number without paying the other legs' builds)
    val mode = args.headOption.getOrElse("")
    val cold = mode.startsWith("cold")
    val audioOnly = mode == "audio"
    val guardOnly = mode == "landmark_guard"
    val driftOnly = mode == "ivf_drift"
    val rest = if (cold || audioOnly || guardOnly || driftOnly) args.drop(1)
      else args
    val scales = if (rest.nonEmpty) rest.toSeq.map(_.toInt)
                 else if (cold) Seq(2000000)
                 else Seq(25000, 100000, 400000)
    val batchN = 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.windows.muteNoPartitionWarning()
    if (cold) scales.foreach { n =>
      if (mode != "cold_embed") runCold(spark, n, batchN)
      if (mode != "cold_text") runColdEmbed(spark, n * 5, batchN)
    }
    else if (audioOnly) scales.foreach { s =>
      runAudioScale(spark, s, batchN)
      runAudioPercepScale(spark, s, batchN)
    }
    else if (guardOnly) runLandmarkGuard(spark)
    else if (driftOnly) runIvfDrift(spark,
      rest.headOption.map(_.toInt).getOrElse(200000))
    else {
      scales.foreach(runScale(spark, _, batchN))
      scales.foreach(runEmbedScale(spark, _, batchN))
      scales.foreach(runAudioScale(spark, _, batchN))
      scales.foreach(runAudioPercepScale(spark, _, batchN))
    }
    spark.stop()
  }

  /** Media-modality leg (r14 advisory #8): the [[graft.multimodal
    * .AudioIndex]] exact-window family measured at the same scales as the
    * five text/embedding families. Clips are 4 x 125 ms windows (1000
    * PCM16 samples at 8 kHz, ~8 KB WAV) with the global segment id
    * embedded exactly in the first samples — every window a distinct
    * content class (the AudioProbe construction: a small modular pattern
    * would collapse to 65k classes and degenerate the corpus to
    * stop-windows). Indexed path scans the persisted fps layout; the
    * recompute path re-reads + RE-DECODES the corpus WAVs per match —
    * the term that grows with the corpus. Same fixed batch, matched
    * counts asserted equal.
    */
  private def runAudioScale(spark: SparkSession, n: Int, batchN: Int): Unit = {
    import spark.implicits._
    import graft.multimodal.{AudioCodec, AudioIndex, Multimodal}
    // media-bytes parquet needs a bounded columnar batch: the vectorized
    // reader reserves rows x bytes CONTIGUOUSLY, and 4096 x ~8 KB WAVs is
    // a 32 MB reservation that fails at the 400k scale (measured). 256
    // rows x 8 KB = 2 MB per batch — the production setting for any
    // binary-media scan; fingerprint layouts (longs) are unaffected.
    val prevBatch = spark.conf.get("spark.sql.parquet.columnarReaderBatchSize", "4096")
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "256")
    try runAudioScaleInner(spark, n, batchN)
    finally spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", prevBatch)
  }

  private def runAudioScaleInner(spark: SparkSession, n: Int, batchN: Int): Unit = {
    import spark.implicits._
    import graft.multimodal.{AudioCodec, AudioIndex, Multimodal}
    val Win = 1000
    def seg(sid: Long): Array[Double] = {
      val a = Array.tabulate(Win)(i =>
        ((((sid * 7919 + i.toLong * 4799) % 65535) - 32767).toInt >> 1) / 32768.0)
      var j = 0
      while (j < 4) {
        a(j) = (((sid >> (16 * j)) & 0xFFFFL).toInt - 32768) / 32768.0
        j += 1
      }
      a
    }
    def clip(id: Long, segKey: Long): Multimodal.MediaRow =
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000,
          (0 until 4).toArray.flatMap(w => seg(segKey * 4 + w))),
        Multimodal.MediaMeta(0, 0, "wav", 500L))
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_sweep_audio_$n").toString
    spark.range(n.toLong).map(id => clip(id, id)).toDF()
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath).as[Multimodal.MediaRow]
    // fixed batch: half fresh content, half exact twins of corpus clips
    val freshN = batchN / 2
    val batch = spark.range(batchN.toLong)
      .map(i => clip(9000000L + i,
        if (i < freshN) 5000000L + i else i - freshN))
      .localCheckpoint(true)
    println(s"[probe] === audio corpus $n clips, batch $batchN (fixed) ===")
    val path = java.nio.file.Files
      .createTempDirectory("graft_sweep_audioidx").toString
    val (idx, tBuild) = time(
      AudioIndex.build(corpus, path, windowMs = 125L, minJaccard = 0.5))
    val (nIdx, tIdx) = time(idx.dedupBatch(batch)
      .select(col("batch_id")).distinct().count())
    val (nRe, tRe) = time(Multimodal.videoNearDupAgainst(
        Multimodal.audioWindowFingerprints(batch, 125L),
        Multimodal.audioWindowFingerprints(
          spark.read.parquet(corpusPath).as[Multimodal.MediaRow], 125L),
        minJaccard = 0.5)
      .select(col("batch_id")).distinct().count())
    assert(nIdx == nRe,
      s"audio contrast invalid: indexed matched $nIdx clips, recompute $nRe")
    assert(nIdx == freshN.toLong,
      s"every planted twin must match: got $nIdx of $freshN")
    println(f"[probe] audio     build $tBuild%6.1f s | match indexed " +
      f"$tIdx%5.1f s vs recompute $tRe%5.1f s (${tRe / tIdx}%.1fx) " +
      f"[$nIdx matched clips]")
    println(f"""{"probe":"index_sweep_audio","corpus":$n,"batch":$batchN,"audio":{"build_sec":$tBuild%.1f,"indexed_sec":$tIdx%.1f,"recompute_sec":$tRe%.1f}}""")
  }

  /** The TWO INEXACT audio geometries (r16 stretch #8) at the exact leg's
    * scales: [[graft.multimodal.AudioPerceptualIndex]] (frame-word
    * shingles) and [[graft.multimodal.AudioLandmarkIndex]] (time-delta
    * landmark triples), indexed-vs-recompute on the same fixed batch.
    * Content is REAL tonal audio (the q166 two-tone synthesis — the FFT
    * families need spectral peaks, not bit patterns): 8 frames x 125 ms
    * at 8 kHz, ~16 KB WAV per clip. Batch twins are EXACT re-uploads (the
    * exact leg's convention): perturbation recall is AudioProbe's
    * measured subject — and NOT deterministic enough to assert here (a
    * 0.5x gain remaster measured 75.8% frame-word recall at this scale:
    * PCM16 quantization flips near-tie band ranks) — while this sweep's
    * subject needs recall pinned at 1.0 so indexed == recompute ==
    * planted count holds and every ratio compares identical work. What
    * the recompute side pays that the indexed side never does is the
    * corpus DECODE + FFT + extraction — the amortization this probe
    * makes visible per scale.
    */
  private def runAudioPercepScale(spark: SparkSession, n: Int, batchN: Int): Unit = {
    val prevBatch = spark.conf.get("spark.sql.parquet.columnarReaderBatchSize", "4096")
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "256")
    try runAudioPercepScaleInner(spark, n, batchN)
    finally spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", prevBatch)
  }

  private def runAudioPercepScaleInner(
      spark: SparkSession, n: Int, batchN: Int): Unit = {
    import spark.implicits._
    import graft.multimodal.{AudioCodec, AudioLandmarkIndex,
      AudioPerceptualIndex, Multimodal}
    def tone(c: Long, f: Int, which: Int): Double = {
      var h = c * 1000003L + f * 7919L + which * 104729L
      h ^= h >>> 13; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      350.0 * math.pow(2800.0 / 350.0, ((h % 24 + 24) % 24) / 23.0)
    }
    def clip(id: Long, c: Long, gain: Double): Multimodal.MediaRow = {
      val samples = Array.tabulate(8 * 1000) { i => // 8 frames x 125 ms
        val tSec = i.toDouble / 8000
        val f = i / 1000
        gain * (0.35 * math.sin(2 * math.Pi * tone(c, f, 0) * tSec) +
          0.35 * math.sin(2 * math.Pi * tone(c, f, 1) * tSec))
      }
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000, samples),
        Multimodal.MediaMeta(0, 0, "wav", 1000L))
    }
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_sweep_percep_$n").toString
    spark.range(n.toLong).map(id => clip(id, id, 1.0)).toDF()
      .write.mode("overwrite").parquet(corpusPath)
    def corpus = spark.read.parquet(corpusPath).as[Multimodal.MediaRow]
    val freshN = batchN / 2
    val batch = spark.range(batchN.toLong)
      .map(i => if (i < freshN) clip(9000000L + i, 5000000L + i, 1.0)
        else clip(9000000L + i, i - freshN, 1.0)) // exact corpus re-upload
      .localCheckpoint(true)
    println(s"[probe] === inexact-audio corpus $n clips, batch $batchN (fixed) ===")
    // perceptual (frame-word) leg
    val pPath = java.nio.file.Files
      .createTempDirectory("graft_sweep_percepidx").toString
    val (pIdx, tBuildP) = time(AudioPerceptualIndex.build(corpus, pPath,
      frameMs = 125L, minJaccard = 0.3))
    val (nIdxP, tIdxP) = time(pIdx.dedupBatch(batch)
      .select(col("batch_id")).distinct().count())
    val (nReP, tReP) = time(Multimodal.videoNearDupAgainst(
        Multimodal.audioSpectralFingerprints(batch, 125L),
        Multimodal.audioSpectralFingerprints(corpus, 125L),
        minJaccard = 0.3)
      .select(col("batch_id")).distinct().count())
    assert(nIdxP == nReP,
      s"perceptual contrast invalid: indexed $nIdxP vs recompute $nReP")
    assert(nIdxP == freshN.toLong,
      s"every planted twin must match perceptually: $nIdxP of $freshN")
    println(f"[probe] percep    build $tBuildP%6.1f s | match indexed " +
      f"$tIdxP%5.1f s vs recompute $tReP%5.1f s (${tReP / tIdxP}%.1fx)")
    // landmark (time-delta triple) leg — at 0.9, not the family default
    // 0.3: 8-frame two-tone clips yield SMALL landmark sets over a
    // 24-bin band alphabet, and distinct content cross-matches at 0.3
    // (measured: 675 false hits per 5000 at this scale). Exact twins
    // score jaccard 1.0, so 0.9 pins the count without changing what
    // the probe measures (decode+FFT+extraction cost is threshold-free).
    val lPath = java.nio.file.Files
      .createTempDirectory("graft_sweep_lmidx").toString
    val (lIdx, tBuildL) = time(AudioLandmarkIndex.build(corpus, lPath,
      frameMs = 125L, minJaccard = 0.9))
    val (nIdxL, tIdxL) = time(lIdx.dedupBatch(batch)
      .select(col("batch_id")).distinct().count())
    val (nReL, tReL) = time(Multimodal.videoNearDupAgainst(
        Multimodal.audioLandmarkFingerprints(batch, 125L),
        Multimodal.audioLandmarkFingerprints(corpus, 125L),
        minJaccard = 0.9)
      .select(col("batch_id")).distinct().count())
    assert(nIdxL == nReL,
      s"landmark contrast invalid: indexed $nIdxL vs recompute $nReL")
    // ≥99%, not ==: a small fraction of two-tone clips produce degenerate
    // landmark sets (< 3 peak events after tone collisions — 19 of 5000
    // planted twins at the 400k scale), and an empty-set clip cannot
    // match even its exact re-upload. Both paths drop the same clips
    // (the equality above is exact), so every ratio still compares
    // identical work.
    assert(nIdxL >= (freshN * 99L) / 100,
      s"planted twins must match via landmarks: $nIdxL of $freshN")
    println(f"[probe] landmark  build $tBuildL%6.1f s | match indexed " +
      f"$tIdxL%5.1f s vs recompute $tReL%5.1f s (${tReL / tIdxL}%.1fx)")
    println(f"""{"probe":"index_sweep_audio_inexact","corpus":$n,"batch":$batchN,"perceptual":{"build_sec":$tBuildP%.1f,"indexed_sec":$tIdxP%.1f,"recompute_sec":$tReP%.1f},"landmark":{"build_sec":$tBuildL%.1f,"indexed_sec":$tIdxL%.1f,"recompute_sec":$tReL%.1f}}""")
  }

  /** IVF DRIFT leg (`ivf_drift` mode) — measures what the maintenance
    * advisory ([[graft.ml.IvfIndex.maintenance]], surfaced at
    * [[graft.sources.VectorStoreCatalog.indexMaintenance]] and checked
    * by `optimize`) guards against: appends assign against FROZEN
    * centroids, so a distribution shift funnels new rows into few lists.
    * Base corpus: n rows over 16 clean 4-dim-block clusters, built at
    * nLists = 16; drift: n more rows ALL in cluster 0's direction.
    *
    * Measured per phase (fresh / drifted / rebuilt): recall@10 at
    * nProbe = 4 against the exact brute-force truth for base-cluster
    * queries and drift-direction queries, the mean PROBED ROWS per query
    * (the real probe-cost unit: rows scanned = work + I/O at any scale),
    * and the maintenance imbalance signal.
    *
    * MEASURED (n = 200k + 200k drift, 2026-08-16): recall stays 1.000
    * through drift and same-geometry rebuild — the funnel list contains
    * its queries' true neighbors, so in this construction skew is a COST
    * disease, not a recall one. Probe cost for hot-direction queries
    * blows up 5× (50,000 → 250,000 rows/query: the whole drifted mass
    * rides every probe touching the funnel list); imbalance 1.00 → 8.50
    * trips the default advisory. A SAME-GEOMETRY rebuild restores
    * balance (8.50 → 2.91) but cuts hot-direction cost only ~9%
    * (250,000 → 228,750): half the corpus now genuinely LIVES in that
    * direction — at fixed nLists probe cost is local density. The
    * RESCALED rebuild (suggestNLists: 633 ≈ sqrt(400k) lists, 60.6 s
    * build vs 11.4 s same-geometry) is the real lever: at np=32 (a 5%
    * probe fraction) base-cluster recall is 0.960 at 16,647 rows/query —
    * 6× cheaper than the same-geometry rebuild at near recall parity —
    * and hot-direction queries read 27,527 rows (8× cheaper) at recall
    * 0.700 (their mass now spans MANY fine lists, so a fixed probe count
    * covers less of it: dense regions want proportionally more probes).
    * Honest operational rule the advisory + optimize(autoRebuildIndex)
    * encode: rebuild repairs skew; rescaling to ~sqrt(N) repairs COST;
    * probe count is the per-query recall dial either way.
    */
  private def runIvfDrift(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    import graft.ml.IvfIndex
    import graft.operators.Knn
    val dim = 64
    val nLists = 16
    val k = 10
    val nProbe = 4
    val base = java.nio.file.Files.createTempDirectory("graft_ivfdrift")
      .toString
    // base corpus: cluster c = one-hot 4-dim block at [4c, 4c+4) + noise
    def mkRows(ids: org.apache.spark.sql.DataFrame, cid: Column): DataFrame =
      ids.select(col("id"), cid.as("c"))
        .select(col("id"), array((0 until dim).map(j =>
          (when(col("c") === j / 4, lit(1.0)).otherwise(lit(0.0)) +
            (rand(42 + j) - lit(0.5)) * lit(0.2)).cast("float")): _*)
          .as("vector"))
    val baseRows = mkRows(spark.range(n).toDF("id"), col("id") % nLists)
    baseRows.write.mode("overwrite").parquet(s"$base/corpus")
    val corpus = spark.read.parquet(s"$base/corpus")
    var t0 = System.nanoTime()
    var idx = IvfIndex.build(corpus, "id", "vector", s"$base/idx",
      nLists = nLists)
    val tBuild = (System.nanoTime() - t0) / 1e9
    // 20 base-cluster queries + 20 drift-direction queries (cluster 0's
    // block), fresh noise draws so they are near, not in, the corpus
    val qBase = mkRows(spark.range(20).toDF("id"), col("id") % nLists)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint(true)
    val qDrift = mkRows(spark.range(20).toDF("id"), lit(0))
      .select((col("id") + 100).as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint(true)
    def recallOf(queries: DataFrame, store: DataFrame, np: Int): Double = {
      val exact = Knn.batchTopK(queries, store, k)
        .select(col("query_id"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ann = idx.searchBatch(queries, k, np)
        .select(col("query_id"), col("id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, e) =>
        (e intersect ann.getOrElse(q, Set.empty)).size.toDouble / k }
      rs.sum / rs.size
    }
    def rowsPerQuery(queries: DataFrame, np: Int): Double = {
      val vecs = queries.select(col("query_vec")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
      vecs.map(v => idx.probedScan(v, np).count().toDouble)
        .sum / vecs.length
    }
    def phase(name: String, store: DataFrame, np: Int = nProbe)
        : (Double, Double, Double, Double, Double) = {
      val rb = recallOf(qBase, store, np)
      val rd = recallOf(qDrift, store, np)
      val cb = rowsPerQuery(qBase, np)
      val cd = rowsPerQuery(qDrift, np)
      val imb = idx.maintenance().imbalance
      println(f"[probe] ivf_drift $name%-12s recall base $rb%.3f drift " +
        f"$rd%.3f | rows/query base $cb%9.0f drift $cd%9.0f | " +
        f"imbalance $imb%.2f")
      (rb, rd, cb, cd, imb)
    }
    val fresh = phase("fresh", corpus)
    // drift: n more rows, every one in cluster 0's direction — the
    // frozen quantizer funnels them into one list
    val driftRows = mkRows(
      spark.range(n).toDF("id").select((col("id") + n).as("id")), lit(0))
    driftRows.write.mode("overwrite").parquet(s"$base/drift")
    idx.append(spark.read.parquet(s"$base/drift"))
    val all = corpus.unionByName(spark.read.parquet(s"$base/drift"))
    val m = idx.maintenance()
    val drifted = phase("drifted", all)
    t0 = System.nanoTime()
    // rebuild from the SOURCE parquets: an in-place build cannot read its
    // own output dir mid-overwrite (and the catalog's rebuild reads the
    // committed store, never the index layout)
    idx = IvfIndex.build(all, "id", "vector", s"$base/idx",
      nLists = nLists)
    val tRebuild = (System.nanoTime() - t0) / 1e9
    val rebuilt = phase("rebuilt", all)
    // the RESCALED repair — what the advisory now suggests and
    // optimize(autoRebuildIndex) executes: rebuild at ~sqrt(N) lists.
    // Measured at the SAME probe count (np=4: equal planning work, far
    // fewer rows) and at np=32 (a 5% probe fraction, the recall-for-cost
    // operating point finer geometry buys)
    val suggested = IvfIndex.suggestNLists(nLists, 2L * n)
    t0 = System.nanoTime()
    idx = IvfIndex.build(all, "id", "vector", s"$base/idx",
      nLists = suggested)
    val tRescale = (System.nanoTime() - t0) / 1e9
    val rescaled4 = phase("rescaled/np4", all, 4)
    val rescaled32 = phase("rescaled/np32", all, 32)
    def j(p: (Double, Double, Double, Double, Double)) =
      f"""{"recall_base":${p._1}%.3f,"recall_drift":${p._2}%.3f,""" +
        f""""rows_base":${p._3}%.0f,"rows_drift":${p._4}%.0f,""" +
        f""""imbalance":${p._5}%.2f}"""
    println(s"""{"probe":"ivf_drift","n":$n,"n_lists":$nLists,""" +
      f""""n_probe":$nProbe,"build_sec":$tBuild%.1f,""" +
      f""""rebuild_sec":$tRebuild%.1f,""" +
      s""""suggested_n_lists":$suggested,""" +
      f""""rescale_build_sec":$tRescale%.1f,""" +
      s""""advisory_tripped":${m.needsRebuild},""" +
      s""""fresh":${j(fresh)},"drifted":${j(drifted)},""" +
      s""""rebuilt":${j(rebuilt)},"rescaled_np4":${j(rescaled4)},""" +
      s""""rescaled_np32":${j(rescaled32)}}""")
  }

  /** The landmark SMALL-SET GUARD leg (`landmark_guard` mode): the
    * measured false-hit regime reproduced at its own scale, then
    * collapsed by the set-size-aware `minShared` floor (shared >=
    * min(minShared, |A|, |B|)). Content is [[runAudioPercepScale]]'s
    * 8-frame two-tone clip — exactly the short-clip class whose landmark
    * sets (3-6 triples) cross a 0.3 Jaccard ratio on 2-3 chance-shared
    * hashes. Two indexes over the SAME 5000-clip corpus at the family's
    * 0.3 default, one with minShared = 4; three probe batches: 5000
    * FRESH clips (distinct content — every match is false), 1000
    * 3%-tempo-stretched corpus twins (the q166 robustness class — every
    * match is true), and 1000 EXACT re-uploads. The guard must collapse
    * the false hits >= 10x, keep exact-re-upload recall IDENTICAL (the
    * min(..., |A|, |B|) leg: a tiny set shared in full always matches —
    * a flat absolute floor would orphan the degenerate 3-landmark
    * clips), and the documented price is part of the tempo-twin tail
    * that shares only 2-3 landmarks — the chance-collision band itself,
    * where the geometry genuinely cannot tell twin from stranger.
    */
  private def runLandmarkGuard(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.multimodal.{AudioCodec, AudioLandmarkIndex, Multimodal}
    def tone(c: Long, f: Int, which: Int): Double = {
      var h = c * 1000003L + f * 7919L + which * 104729L
      h ^= h >>> 13; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      350.0 * math.pow(2800.0 / 350.0, ((h % 24 + 24) % 24) / 23.0)
    }
    def clip(id: Long, c: Long, stretch: Double): Multimodal.MediaRow = {
      val samples = Array.tabulate((8 * 1000 * stretch).toInt) { i =>
        val tSec = i.toDouble / 8000
        val f = (i / (1000.0 * stretch)).toInt
        0.35 * math.sin(2 * math.Pi * tone(c, f, 0) * tSec) +
          0.35 * math.sin(2 * math.Pi * tone(c, f, 1) * tSec)
      }
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000, samples),
        Multimodal.MediaMeta(0, 0, "wav", (1000 * stretch).toLong))
    }
    val n = 5000
    val corpus = spark.range(n.toLong).map(id => clip(id, id, 1.0))
      .localCheckpoint(true)
    val fresh = spark.range(n.toLong)
      .map(i => clip(9000000L + i, 5000000L + i, 1.0)).localCheckpoint(true)
    val twins = spark.range(1000L)
      .map(i => clip(8000000L + i, i, 1.03)).localCheckpoint(true)
    val exact = spark.range(1000L)
      .map(i => clip(7000000L + i, i, 1.0)).localCheckpoint(true)
    def idxDir() = java.nio.file.Files
      .createTempDirectory("graft_lmguard").toString
    val unguarded = AudioLandmarkIndex.build(corpus, idxDir(),
      frameMs = 125L, minJaccard = 0.3)
    val guarded = AudioLandmarkIndex.build(corpus, idxDir(),
      frameMs = 125L, minJaccard = 0.3, minShared = 4)
    def hits(idx: AudioLandmarkIndex, batch: org.apache.spark.sql.Dataset[
        Multimodal.MediaRow]): Long =
      idx.dedupBatch(batch).select(col("batch_id")).distinct().count()
    val (falseU, falseG) = (hits(unguarded, fresh), hits(guarded, fresh))
    val (twinU, twinG) = (hits(unguarded, twins), hits(guarded, twins))
    val (exactU, exactG) = (hits(unguarded, exact), hits(guarded, exact))
    assert(falseU >= 100,
      s"construction must reproduce the false-hit regime (got $falseU/5000)")
    assert(falseG * 10 <= falseU,
      s"the guard must collapse false hits >= 10x: $falseU -> $falseG")
    assert(exactG == exactU,
      s"exact re-upload recall must be UNTOUCHED by the size-aware floor: " +
        s"$exactU -> $exactG of 1000")
    assert(twinG * 3 >= twinU * 2,
      s"tempo-twin recall outside the chance band must hold: " +
        s"$twinU -> $twinG of 1000")
    println(f"[probe] landmark guard (minJaccard 0.3, 8-frame clips, " +
      f"minShared=4 size-aware): false hits $falseU%4d/5000 -> " +
      f"$falseG%3d/5000; tempo-twin recall $twinU%4d -> $twinG%4d/1000; " +
      f"exact re-upload recall $exactU%4d -> $exactG%4d/1000")
    println(s"""{"probe":"landmark_guard","corpus":$n,"false_unguarded":$falseU,"false_guarded":$falseG,"twin_unguarded":$twinU,"twin_guarded":$twinG,"exact_unguarded":$exactU,"exact_guarded":$exactG}""")
  }

  /** 8 paragraphs of 25 words over a 500-word vocab, keyed by doc id:
    * ~1 KB/doc like [[IngestProbe]], but "\n"-delimited so the segment
    * index stores real per-paragraph hashes.
    */
  private def textFor(idCol: Column): Column = {
    val vocab = array((0 until 500).map(i => lit(s"w$i")): _*)
    array_join(
      transform(sequence(lit(0), lit(7)), p => array_join(
        transform(sequence(lit(1), lit(25)),
          w => element_at(vocab,
            pmod(hash(idCol * 1000 + p * 100 + w), lit(500)) + 1)), " ")),
      "\n")
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  private def runScale(spark: SparkSession, n: Int, batchN: Int): Unit = {
    // the corpus is MATERIALIZED as parquet (IngestProbe's rule): the
    // index's whole point is skipping the corpus re-read/re-fingerprint,
    // so a generated-on-the-fly corpus would flatter the recompute path
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_sweep_corpus_$n").toString
    spark.range(n.toLong).select(col("id"), textFor(col("id")).as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    // fixed batch as the corpus grows: half fresh, 30% corpus near-copies
    // (one appended word — inside every family's match radius, and 7 of 8
    // paragraphs unchanged), 20% near-copies of the batch's own fresh half.
    // text resolves BEFORE the id re-key (two selects — the lateral-alias
    // trap would silently re-key the planted copies)
    val freshN = batchN / 2
    val corpDupN = batchN * 3 / 10
    val batch = spark.range(batchN.toLong).select(col("id"),
        when(col("id") < freshN, textFor(col("id") + n))
          .when(col("id") < freshN + corpDupN,
            concat(textFor(col("id") - freshN), lit(" extra")))
          .otherwise(concat(textFor(pmod(col("id"), lit(freshN)) + n), lit(" copy")))
          .as("text"))
      .select((col("id") + n).as("id"), col("text"))
      .localCheckpoint(true)
    println(s"[probe] === corpus $n docs, batch $batchN (fixed) ===")

    def family(name: String)(build: String => Any)(
        indexed: Any => Long)(recompute: () => Long): (Double, Double, Double) = {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_sweep_$name").toString
      val (idx, tBuild) = time(build(path))
      val (nIdx, tIdx) = time(indexed(idx))
      val (nRe, tRe) = time(recompute())
      assert(nIdx == nRe,
        s"$name contrast invalid: indexed matched $nIdx docs, recompute $nRe")
      println(f"[probe] $name%-8s build $tBuild%6.1f s | match indexed " +
        f"$tIdx%5.1f s vs recompute $tRe%5.1f s (${tRe / tIdx}%.1fx) " +
        f"[$nIdx matched docs]")
      (tBuild, tIdx, tRe)
    }

    val (mhB, mhI, mhR) = family("minhash") {
      FingerprintIndex.build(corpus, "id", "text", _)
    } { idx =>
      idx.asInstanceOf[FingerprintIndex]
        .dedupBatch(batch, "id", "text", threshold = 0.8)
        .select(col("batch_id")).distinct().count()
    } { () =>
      Dedup.nearDupAgainstMinHash(corpus, batch, "id", "text", threshold = 0.8)
        .select(col("batch_id")).distinct().count()
    }

    val (shB, shI, shR) = family("simhash") {
      HammingIndex.buildFromText(corpus, "id", "text", _)
    } { idx =>
      idx.asInstanceOf[HammingIndex].dedupBatchText(batch, "id", "text")
        .select(col("batch_id")).distinct().count()
    } { () =>
      // no-index twin of dedupBatchText: re-read + re-SimHash the corpus
      // parquet, band both sides (the index's exact geometry: 4 x 16-bit
      // pigeonhole chunks), bucket-join, verify hamming <= 3. In-memory
      // only — charging a throwaway index WRITE to this path would
      // overstate the ratio.
      val nBands = 4; val width = 64 / nBands; val mask = (1L << width) - 1
      def fps(df: DataFrame) = df.select(col("id"),
        Dedup.simhash(split(col("text"), " ")).as("fp"))
      def banded(df: DataFrame) = {
        val chunks = array((0 until nBands).map { j =>
          struct(lit(j).as("band"),
            shiftright(col("fp"), j * width).bitwiseAND(lit(mask)).as("bucket"))
        }: _*)
        df.select(col("fp")).distinct()
          .select(col("fp"), explode(chunks).as("bb"))
          .select(col("fp"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      }
      val bFps = fps(batch).localCheckpoint(true)
      val cFps = fps(corpus)
      // same 1000-per-bucket cap as dedupBatchText's default, lowest fps
      // kept — the cap must match or the contrast compares different work
      val wBucket = Window.partitionBy(col("band"), col("bucket"))
        .orderBy(col("fp"))
      val cBanded = banded(cFps)
        .withColumn("_rn", row_number().over(wBucket))
        .filter(col("_rn") <= 1000).drop("_rn")
      banded(bFps).as("b")
        .join(cBanded.as("c"), Seq("band", "bucket"))
        .select(col("b.fp").as("fp_b"), col("c.fp").as("fp_c"))
        .dropDuplicates("fp_b", "fp_c")
        .filter(Dedup.hamming64(col("fp_b"), col("fp_c")) <= 3)
        .join(bFps.select(col("id").as("batch_id"), col("fp").as("fp_b")),
          Seq("fp_b"))
        .select(col("batch_id")).distinct().count()
    }

    val (sgB, sgI, sgR) = family("segment") {
      SegmentIndex.build(corpus, "id", "text", _)
    } { idx =>
      idx.asInstanceOf[SegmentIndex].dedupBatch(batch, "id", "text")
        .agg(sum(col("n_removed"))).collect().head.getLong(0)
    } { () =>
      // no-index twin: re-read + re-segment + re-hash the corpus parquet
      val segs = corpus
        .select(explode(split(col("text"), "\n")).as("_s"))
        .filter(length(col("_s")) >= 1)
        .select(xxhash64(col("_s")).as("h")).distinct()
      Dedup.dedupParagraphsAgainst(batch, "id", "text", segs)
        .agg(sum(col("n_removed"))).collect().head.getLong(0)
    }

    println(f"""{"probe":"index_sweep","corpus":$n,"batch":$batchN,"minhash":{"build_sec":$mhB%.1f,"indexed_sec":$mhI%.1f,"recompute_sec":$mhR%.1f},"simhash":{"build_sec":$shB%.1f,"indexed_sec":$shI%.1f,"recompute_sec":$shR%.1f},"segment":{"build_sec":$sgB%.1f,"indexed_sec":$sgI%.1f,"recompute_sec":$sgR%.1f}}""")
  }

  /** No-index twin of the wide-signature `HyperplaneIndex.dedupBatch`:
    * re-read + re-sign the corpus under the index's exact geometry (same
    * planes — `nBits` over 8 bands, seed 42), band both sides, cap 1000,
    * verify exact cosine. In-memory only; no throwaway index write is
    * charged to it. Shared by the warm sweep and the cold legs so every
    * contrast times identical work.
    */
  private def hyperWideRecompute(
      corpus: DataFrame, batch: DataFrame, dim: Int, threshold: Double,
      nBits: Int = 128): Long = {
    import org.apache.spark.sql.graftx.Bridge
    val planes = graft.functions.AnnUtil.randomPlanesWide(nBits, dim, 42L)
    val nWords = (nBits + 63) / 64
    def signed(df: DataFrame) = (0 until nWords).foldLeft(
      df.select(col("id"), col("vec"))) { (d, w) =>
      d.withColumn(s"sig$w", Bridge.column(graft.functions.HyperplaneSignature(
        Bridge.expression(col("vec")),
        planes.slice(w * 64, math.min((w + 1) * 64, nBits)))))
    }
    def banded(df: DataFrame) = {
      val width = nBits / 8; val mask = if (width == 64) -1L else (1L << width) - 1
      val chunks = array((0 until 8).map { j =>
        val w = (j * width) / 64; val off = (j * width) % 64
        struct(lit(j).as("band"),
          shiftright(col(s"sig$w"), off).bitwiseAND(lit(mask)).as("bucket"))
      }: _*)
      df.select(col("id"), explode(chunks).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val bSigned = signed(batch).localCheckpoint(true)
    val cSigned = signed(corpus)
    val wBucket = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col("id"))
    val cBanded = banded(cSigned)
      .withColumn("_rn", row_number().over(wBucket))
      .filter(col("_rn") <= 1000).drop("_rn")
    banded(bSigned).as("b")
      .join(cBanded.as("c"), Seq("band", "bucket"))
      .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
      .join(bSigned.select(col("id").as("batch_id"), col("vec").as("v_b")),
        Seq("batch_id"))
      .join(cSigned.select(col("id").as("corpus_id"), col("vec").as("v_c")),
        Seq("corpus_id"))
      .filter(graft.functions.vector.cosine_sim(col("v_b"), col("v_c"))
        >= threshold)
      .select(col("batch_id")).distinct().count()
  }

  /** Drop the OS page cache (root-only; returns false where not permitted
    * so the cold leg can report itself honestly instead of silently
    * measuring a warm read).
    */
  private def dropCaches(): Boolean =
    try {
      new ProcessBuilder("sync").start().waitFor()
      new ProcessBuilder("sh", "-c", "echo 3 > /proc/sys/vm/drop_caches")
        .start().waitFor() == 0
    } catch { case _: Exception => false }

  private def duBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  /** (rchar, read_bytes) from /proc/self/io — whole-JVM I/O counters.
    * `rchar` is every byte the process ASKED the filesystem for (cache-
    * served or not): the read-volume number that scales with data size.
    * `read_bytes` is what actually hit storage: ~0 warm, the true disk
    * cost after a cache drop. Spark's own `inputMetrics.bytesRead` is NOT
    * usable here — on local file:// the vectorized parquet reader's data-
    * page reads bypass the Hadoop FileSystem statistics it samples (a
    * 131 MB full scan reports 0.04 MB; verified empirically), and block-
    * manager traffic (localCheckpoint re-reads) DOES count, so it
    * measures the wrong thing in both directions.
    */
  private def procIo(): (Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/self/io")
    try {
      val m = src.getLines().map(_.split(":\\s*"))
        .map(a => a(0) -> a(1).trim.toLong).toMap
      (m("rchar"), m("read_bytes"))
    } finally src.close()
  }

  /** Run `f`, returning (result, seconds, bytes requested, bytes from
    * disk) — I/O via [[procIo]] deltas. Whole-JVM counters, so shuffle
    * spill reads and jar loads are included; at the GB scales the cold
    * legs run, parquet dominates.
    */
  private def measured[T](f: => T): (T, Double, Long, Long) = {
    val (rc0, rb0) = procIo()
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    val (rc1, rb1) = procIo()
    (r, sec, rc1 - rc0, rb1 - rb0)
  }

  /** BEYOND-PAGE-CACHE leg (`cold` mode): the warm sweep's minhash
    * contrast with the OS page cache DROPPED before each timed match, plus
    * per-path task-level bytesRead — the stored-layout-vs-recompute I/O
    * claim as a measurement instead of a design argument. The warm sweep
    * (README "Scale design") times CPU work on page-cached parquet; at
    * 100 TB nothing is page-cached, and what separates the paths is what
    * they must READ: the indexed match scans the slim banding layout
    * (three longs per band-row) + candidate-bounded hash gathers, while
    * the recompute path must re-read and re-fingerprint the full corpus
    * text. Usage: `runMain graft.tools.IndexSweepProbe cold [n ...]`
    * (default 2,000,000 docs ~ 2 GB of corpus parquet).
    */
  private def runCold(spark: SparkSession, n: Int, batchN: Int): Unit = {
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_corpus_$n").toString
    spark.range(n.toLong).select(col("id"), textFor(col("id")).as("text"))
      .write.mode("overwrite").parquet(corpusPath)
    val freshN = batchN / 2
    val corpDupN = batchN * 3 / 10
    val batch = spark.range(batchN.toLong).select(col("id"),
        when(col("id") < freshN, textFor(col("id") + n))
          .when(col("id") < freshN + corpDupN,
            concat(textFor(col("id") - freshN), lit(" extra")))
          .otherwise(concat(textFor(pmod(col("id"), lit(freshN)) + n), lit(" copy")))
          .as("text"))
      .select((col("id") + n).as("id"), col("text"))
      .localCheckpoint(true)
    val idxPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_idx_$n").toString
    val (idx, tBuild) = time(FingerprintIndex.build(
      spark.read.parquet(corpusPath), "id", "text", idxPath))
    val corpusBytes = duBytes(corpusPath)
    val idxBytes = duBytes(idxPath)
    println(f"[probe] === COLD minhash: corpus $n docs " +
      f"(${corpusBytes / 1e6}%.0f MB parquet), index layouts " +
      f"${idxBytes / 1e6}%.0f MB, build $tBuild%.1f s ===")

    def indexed(): Long = idx
      .dedupBatch(batch, "id", "text", threshold = 0.8)
      .select(col("batch_id")).distinct().count()
    def recompute(): Long = Dedup.nearDupAgainstMinHash(
        spark.read.parquet(corpusPath), batch, "id", "text", threshold = 0.8)
      .select(col("batch_id")).distinct().count()

    val (iCold, iReq, iDisk, iWarm, nIdx) = coldLeg("indexed")(() => indexed())
    val (rCold, rReq, rDisk, rWarm, nRe) = coldLeg("recompute")(() => recompute())
    assert(nIdx == nRe,
      s"cold contrast invalid: indexed matched $nIdx, recompute $nRe")

    // the GATHER-BUCKETED layout: same index, fat docs layout written under
    // gb = pmod(id, B) directories (B >> candidate count), so the verify
    // gather's id set prunes DIRECTORIES instead of reading the whole
    // layout past a global min/max filter — the disk_mb delta vs the flat
    // indexed leg is the dir-prune's measured worth
    val gbBuckets = 16384
    val idxGbPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_idxgb_$n").toString
    val (idxGb, tBuildGb) = time(FingerprintIndex.build(
      spark.read.parquet(corpusPath), "id", "text", idxGbPath,
      gatherBuckets = gbBuckets))
    println(f"[probe] bucketed index (B=$gbBuckets): layouts " +
      f"${duBytes(idxGbPath) / 1e6}%.0f MB, build $tBuildGb%.1f s")
    def indexedGb(): Long = idxGb
      .dedupBatch(batch, "id", "text", threshold = 0.8)
      .select(col("batch_id")).distinct().count()
    val (gCold, gReq, gDisk, gWarm, nGb) = coldLeg("indexed_gb")(() => indexedGb())
    assert(nGb == nIdx,
      s"bucketed contrast invalid: bucketed matched $nGb, flat $nIdx")
    println(f"""{"probe":"index_sweep_cold","corpus":$n,"batch":$batchN,"corpus_mb":${corpusBytes / 1e6}%.0f,"index_mb":${idxBytes / 1e6}%.0f,"build_sec":$tBuild%.1f,"indexed":{"cold_sec":$iCold%.1f,"requested_mb":${iReq / 1e6}%.0f,"disk_mb":${iDisk / 1e6}%.0f,"warm_sec":$iWarm%.1f},"indexed_gb":{"buckets":$gbBuckets,"cold_sec":$gCold%.1f,"requested_mb":${gReq / 1e6}%.0f,"disk_mb":${gDisk / 1e6}%.0f,"warm_sec":$gWarm%.1f},"recompute":{"cold_sec":$rCold%.1f,"requested_mb":${rReq / 1e6}%.0f,"disk_mb":${rDisk / 1e6}%.0f,"warm_sec":$rWarm%.1f}}""")
  }

  /** Cache-drop + cold/warm run of one leg; returns (coldSec,
    * requestedBytes, diskBytes, warmSec, matched). The cold run follows a
    * [[dropCaches]]; the warm repeat shows what the cache was worth.
    */
  private def coldLeg(name: String)(f: () => Long): (Double, Long, Long, Double, Long) = {
    val dropped = dropCaches()
    if (!dropped) println(s"[probe] WARNING: cache drop not permitted — " +
      s"'$name cold' is actually warm")
    val (nCold, tCold, reqCold, diskCold) = measured(f())
    val (nWarm, tWarm, _, _) = measured(f())
    assert(nCold == nWarm)
    println(f"[probe] $name%-9s cold $tCold%6.1f s (${reqCold / 1e6}%7.0f MB " +
      f"requested, ${diskCold / 1e6}%7.0f MB from disk) | warm $tWarm%6.1f s " +
      f"[$nCold matched]")
    (tCold, reqCold, diskCold, tWarm, nCold)
  }

  /** The cold leg for the EMBEDDING side ([[runCold]]'s shape on the
    * 128/8 hyperplane family — the geometry the warm sweep recommends at
    * corpus scale): same cache-drop + bytesRead instrumentation, vector
    * corpus 5x the text leg's row count (rows are ~260 B vs ~1 KB). The
    * warm sweep's honest finding was "no local crossover — signing a
    * page-cached corpus is compute-trivial"; this leg measures what page
    * cache was hiding: the recompute path must RE-READ the full vector
    * parquet every batch, the indexed path reads probed band slices +
    * candidate-bounded vec gathers.
    */
  private def runColdEmbed(spark: SparkSession, n: Int, batchN: Int): Unit = {
    val dim = 64
    val threshold = 0.99
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_emb_$n").toString
    spark.range(n.toLong).select(col("id"), vecFor(col("id"), dim).as("vec"))
      .write.mode("overwrite").parquet(corpusPath)
    val freshN = batchN / 2
    val corpDupN = batchN * 3 / 10
    val batch = spark.range(batchN.toLong).select(col("id"),
        when(col("id") < freshN, vecFor(col("id") + n, dim))
          .when(col("id") < freshN + corpDupN,
            transform(vecFor(col("id") - freshN, dim), x => x * lit(2.0f)))
          .otherwise(transform(vecFor(pmod(col("id"), lit(freshN)) + n, dim),
            x => x * lit(2.0f)))
          .as("vec"))
      .select((col("id") + n).as("id"), col("vec"))
      .localCheckpoint(true)
    val idxPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_embidx_$n").toString
    val (idx, tBuild) = time(HyperplaneIndex.build(
      spark.read.parquet(corpusPath), "id", "vec", idxPath,
      dim = dim, nBits = 128))
    val corpusBytes = duBytes(corpusPath)
    val idxBytes = duBytes(idxPath)
    println(f"[probe] === COLD hyper128: corpus $n vecs " +
      f"(${corpusBytes / 1e6}%.0f MB parquet), index layouts " +
      f"${idxBytes / 1e6}%.0f MB, build $tBuild%.1f s ===")

    def indexed(): Long = idx
      .dedupBatch(batch, "id", "vec", threshold)
      .select(col("batch_id")).distinct().count()
    def recompute(): Long = hyperWideRecompute(
      spark.read.parquet(corpusPath), batch, dim, threshold)

    val (iCold, iReq, iDisk, iWarm, nIdx) = coldLeg("indexed")(() => indexed())
    val (rCold, rReq, rDisk, rWarm, nRe) = coldLeg("recompute")(() => recompute())
    assert(nIdx == nRe,
      s"cold embed contrast invalid: indexed matched $nIdx, recompute $nRe")

    // the gather-bucketed vecs layout — see runCold's indexed_gb leg.
    // NOTE: at this corpus/geometry (10M rows, 16-bit buckets -> ~150
    // rows/bucket) the banding join yields MILLIONS of incidental
    // candidates, so the gather prune hits its id cap and BOTH indexed
    // legs fall back to the full-layout verify join by design — bucketing
    // cannot help a candidate-bound geometry. The 256-bit legs below are
    // the fix.
    val gbBuckets = 16384
    val idxGbPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_embidxgb_$n").toString
    val (idxGb, tBuildGb) = time(HyperplaneIndex.build(
      spark.read.parquet(corpusPath), "id", "vec", idxGbPath,
      dim = dim, nBits = 128, gatherBuckets = gbBuckets))
    println(f"[probe] bucketed index (B=$gbBuckets): layouts " +
      f"${duBytes(idxGbPath) / 1e6}%.0f MB, build $tBuildGb%.1f s")
    def indexedGb(): Long = idxGb
      .dedupBatch(batch, "id", "vec", threshold)
      .select(col("batch_id")).distinct().count()
    val (gCold, gReq, gDisk, gWarm, nGb) = coldLeg("indexed_gb")(() => indexedGb())
    assert(nGb == nIdx,
      s"bucketed contrast invalid: bucketed matched $nGb, flat $nIdx")

    // the GEOMETRY lever at corpus scale: 256 bits / 8 bands = 32-bit
    // buckets (~0.002 expected rows per bucket at 10M), so candidates are
    // OUTPUT-bound (planted near-dups only), the gather prune stays under
    // its id cap, and with gatherBuckets the verify gather reads candidate
    // DIRECTORIES instead of the whole vecs layout — the two levers
    // composing. Recall on sign-identical copies is structural (all
    // bands collide); the recompute twin runs the identical geometry.
    val idx256Path = java.nio.file.Files
      .createTempDirectory(s"graft_cold_embidx256_$n").toString
    val (idx256, tBuild256) = time(HyperplaneIndex.build(
      spark.read.parquet(corpusPath), "id", "vec", idx256Path,
      dim = dim, nBits = 256))
    val idx256GbPath = java.nio.file.Files
      .createTempDirectory(s"graft_cold_embidx256gb_$n").toString
    val (idx256Gb, tBuild256Gb) = time(HyperplaneIndex.build(
      spark.read.parquet(corpusPath), "id", "vec", idx256GbPath,
      dim = dim, nBits = 256, gatherBuckets = gbBuckets))
    println(f"[probe] 256-bit indexes: flat build $tBuild256%.1f s, " +
      f"bucketed build $tBuild256Gb%.1f s")
    def indexed256(): Long = idx256
      .dedupBatch(batch, "id", "vec", threshold)
      .select(col("batch_id")).distinct().count()
    def indexed256Gb(): Long = idx256Gb
      .dedupBatch(batch, "id", "vec", threshold)
      .select(col("batch_id")).distinct().count()
    def recompute256(): Long = hyperWideRecompute(
      spark.read.parquet(corpusPath), batch, dim, threshold, nBits = 256)
    val (h6Cold, h6Req, h6Disk, h6Warm, n256) =
      coldLeg("hy256")(() => indexed256())
    val (g6Cold, g6Req, g6Disk, g6Warm, n256Gb) =
      coldLeg("hy256_gb")(() => indexed256Gb())
    val (r6Cold, r6Req, r6Disk, r6Warm, n256Re) =
      coldLeg("hy256_re")(() => recompute256())
    assert(n256 == n256Gb && n256 == n256Re,
      s"256-bit contrast invalid: flat $n256, bucketed $n256Gb, recompute $n256Re")

    println(f"""{"probe":"index_sweep_cold_embed","corpus":$n,"batch":$batchN,"corpus_mb":${corpusBytes / 1e6}%.0f,"index_mb":${idxBytes / 1e6}%.0f,"build_sec":$tBuild%.1f,"indexed":{"cold_sec":$iCold%.1f,"requested_mb":${iReq / 1e6}%.0f,"disk_mb":${iDisk / 1e6}%.0f,"warm_sec":$iWarm%.1f},"indexed_gb":{"buckets":$gbBuckets,"cold_sec":$gCold%.1f,"requested_mb":${gReq / 1e6}%.0f,"disk_mb":${gDisk / 1e6}%.0f,"warm_sec":$gWarm%.1f},"recompute":{"cold_sec":$rCold%.1f,"requested_mb":${rReq / 1e6}%.0f,"disk_mb":${rDisk / 1e6}%.0f,"warm_sec":$rWarm%.1f},"indexed256":{"cold_sec":$h6Cold%.1f,"requested_mb":${h6Req / 1e6}%.0f,"disk_mb":${h6Disk / 1e6}%.0f,"warm_sec":$h6Warm%.1f},"indexed256_gb":{"buckets":$gbBuckets,"cold_sec":$g6Cold%.1f,"requested_mb":${g6Req / 1e6}%.0f,"disk_mb":${g6Disk / 1e6}%.0f,"warm_sec":$g6Warm%.1f},"recompute256":{"cold_sec":$r6Cold%.1f,"requested_mb":${r6Req / 1e6}%.0f,"disk_mb":${r6Disk / 1e6}%.0f,"warm_sec":$r6Warm%.1f}}""")
  }

  /** Deterministic pseudo-random embedding (`dim` floats in [-1, 1]) keyed
    * by id — scaled copies (x2) keep every hyperplane sign and land in the
    * source's SemDeDup cluster (cosine is scale-invariant), so the planted
    * near-dups collide on both embedding index families.
    */
  private def vecFor(idCol: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      ((pmod(hash(idCol * lit(dim * 31) + j), lit(2000001)) - lit(1000000)) /
        lit(1000000.0)).cast("float"))

  /** The [[runScale]] contrast for the EMBEDDING index families
    * ([[HyperplaneIndex]], [[graft.ml.SemDedupIndex]]): same materialized-
    * corpus rule, same fixed batch shape (half fresh, 30% corpus
    * near-copies, 20% batch-internal copies — scaled x2, inside
    * cosine >= 0.99), and the recompute twin re-reads + re-signs /
    * re-assigns the corpus parquet in memory under the SAME geometry
    * (planes / frozen centroids — centroids are published SemDeDup state,
    * so the honest no-index cost is corpus re-assignment, not
    * re-clustering). Matched batch-id counts are asserted identical.
    */
  private def runEmbedScale(spark: SparkSession, n: Int, batchN: Int): Unit = {
    val dim = 64
    val threshold = 0.99
    val corpusPath = java.nio.file.Files
      .createTempDirectory(s"graft_sweep_emb_$n").toString
    spark.range(n.toLong).select(col("id"), vecFor(col("id"), dim).as("vec"))
      .write.mode("overwrite").parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val freshN = batchN / 2
    val corpDupN = batchN * 3 / 10
    val batch = spark.range(batchN.toLong).select(col("id"),
        when(col("id") < freshN, vecFor(col("id") + n, dim))
          .when(col("id") < freshN + corpDupN,
            transform(vecFor(col("id") - freshN, dim), x => x * lit(2.0f)))
          .otherwise(transform(vecFor(pmod(col("id"), lit(freshN)) + n, dim),
            x => x * lit(2.0f)))
          .as("vec"))
      .select((col("id") + n).as("id"), col("vec"))
      .localCheckpoint(true)
    println(s"[probe] === embedding corpus $n vecs, batch $batchN (fixed) ===")

    def family(name: String)(build: String => Any)(
        indexed: Any => Long)(recompute: () => Long): (Double, Double, Double) = {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_sweep_$name").toString
      val (idx, tBuild) = time(build(path))
      val (nIdx, tIdx) = time(indexed(idx))
      val (nRe, tRe) = time(recompute())
      assert(nIdx == nRe,
        s"$name contrast invalid: indexed matched $nIdx ids, recompute $nRe")
      println(f"[probe] $name%-10s build $tBuild%6.1f s | match indexed " +
        f"$tIdx%5.1f s vs recompute $tRe%5.1f s (${tRe / tIdx}%.1fx) " +
        f"[$nIdx matched ids]")
      (tBuild, tIdx, tRe)
    }

    val (hpB, hpI, hpR) = family("hyperplane") {
      HyperplaneIndex.build(corpus, "id", "vec", _, dim = dim)
    } { idx =>
      idx.asInstanceOf[HyperplaneIndex]
        .dedupBatch(batch, "id", "vec", threshold)
        .select(col("batch_id")).distinct().count()
    } { () =>
      // no-index twin of dedupBatch: re-read + re-sign the corpus parquet
      // under the index's exact geometry (same planes — 64 bits, 8 bands,
      // seed 42), band both sides, cap 1000, verify exact cosine. In-memory
      // only; no throwaway index write is charged to this path.
      import org.apache.spark.sql.graftx.Bridge
      val planes = graft.functions.AnnUtil.randomPlanes(64, dim, 42L)
      def signed(df: DataFrame) = df.select(col("id"), col("vec"),
        Bridge.column(graft.functions.HyperplaneSignature(
          Bridge.expression(col("vec")), planes)).as("sig"))
      def banded(df: DataFrame) = {
        val width = 64 / 8; val mask = (1L << width) - 1
        val chunks = array((0 until 8).map { j =>
          struct(lit(j).as("band"),
            shiftright(col("sig"), j * width).bitwiseAND(lit(mask)).as("bucket"))
        }: _*)
        df.select(col("id"), explode(chunks).as("bb"))
          .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      }
      val bSigned = signed(batch).localCheckpoint(true)
      val cSigned = signed(corpus)
      val wBucket = Window.partitionBy(col("band"), col("bucket"))
        .orderBy(col("id"))
      val cBanded = banded(cSigned.select(col("id"), col("sig")))
        .withColumn("_rn", row_number().over(wBucket))
        .filter(col("_rn") <= 1000).drop("_rn")
      banded(bSigned.select(col("id"), col("sig"))).as("b")
        .join(cBanded.as("c"), Seq("band", "bucket"))
        .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
        .dropDuplicates("batch_id", "corpus_id")
        .join(bSigned.select(col("id").as("batch_id"), col("vec").as("v_b")),
          Seq("batch_id"))
        .join(cSigned.select(col("id").as("corpus_id"), col("vec").as("v_c")),
          Seq("corpus_id"))
        .filter(graft.functions.vector.cosine_sim(col("v_b"), col("v_c"))
          >= threshold)
        .select(col("batch_id")).distinct().count()
    }

    // the same contrast under the WIDE geometry (128 bits / 8 bands =
    // 16-bit buckets): the selectivity lever the 64/8 default lacks at
    // 100k+ corpora — candidates collapse ~256x, so the verify join stops
    // dominating and the indexed-vs-recompute contrast isolates the
    // corpus-side work again
    val (hp2B, hp2I, hp2R) = family("hyper128") {
      HyperplaneIndex.build(corpus, "id", "vec", _, dim = dim, nBits = 128)
    } { idx =>
      idx.asInstanceOf[HyperplaneIndex]
        .dedupBatch(batch, "id", "vec", threshold)
        .select(col("batch_id")).distinct().count()
    } { () => hyperWideRecompute(corpus, batch, dim, threshold) }

    // frozen centroids: the first 64 corpus vectors (deterministic — the
    // q72 buildWithCentroids discipline); the DEFAULT corpus-side cluster
    // cap applies identically on both paths (same window, same id order),
    // so the matched sets cannot diverge on cap truncation
    val cents = corpus.filter(col("id") < 64).orderBy(col("id"))
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val (sdB, sdI, sdR) = family("semdedup") {
      graft.ml.SemDedupIndex.buildWithCentroids(corpus, "id", "vec", _, cents)
    } { idx =>
      idx.asInstanceOf[graft.ml.SemDedupIndex.Index]
        .dedupBatch(batch, "id", "vec", threshold)
        .select(col("batch_id")).distinct().count()
    } { () =>
      // no-index twin: re-read + re-ASSIGN the corpus parquet against the
      // same frozen centroids (the cost the stored cluster-partitioned
      // layout amortizes), then the same capped cluster-scoped batch x
      // corpus exact-cosine verify. Assignment uses the index's own probe
      // expression, so cluster choice is bit-identical.
      import org.apache.spark.sql.graftx.Bridge
      def assign(df: DataFrame) = df.select(col("id"), col("vec"),
        Bridge.column(graft.functions.CentroidProbes(
          Bridge.expression(col("vec")),
          cents.map(c => { // mirror the cosine-metric centroid normalization
            val nrm = math.max(math.sqrt(c.map(x => x * x).sum), 1e-8)
            c.map(_ / nrm)
          }),
          graft.functions.vector.MetricCosine, 1)).getItem(0).as("cluster"))
      val bAssigned = assign(batch).localCheckpoint(true)
      val wCluster = Window.partitionBy(col("cluster")).orderBy(col("id"))
      val cAssigned = assign(corpus)
        .withColumn("_rn", row_number().over(wCluster))
        .filter(col("_rn") <= 10000).drop("_rn") // dedupBatch's default cap
      bAssigned.as("b")
        .join(cAssigned.as("c"), col("b.cluster") === col("c.cluster"))
        .filter(graft.functions.vector.cosine_sim(col("b.vec"), col("c.vec"))
          >= threshold)
        .select(col("b.id")).distinct().count()
    }

    // the PRUNING case the cluster-partitioned layout exists for: a batch
    // concentrated in 4 of the 64 clusters (10k scaled copies of 4 centroid
    // vectors). The indexed path reads ONLY those 4 list_id partitions;
    // the no-index twin must still assign the whole corpus to even learn
    // which rows are comparable — the uniform-batch leg above is the
    // pruning worst case, this is the realistic drift/topic-burst shape.
    val skewBatch = spark.range(batchN.toLong).select(
        (col("id") + n).as("id"),
        transform(vecFor(pmod(col("id"), lit(4)), dim), x => x * lit(2.0f))
          .as("vec"))
      .localCheckpoint(true)
    val (skB, skI, skR) = family("semdedup_skew") {
      graft.ml.SemDedupIndex.buildWithCentroids(corpus, "id", "vec", _, cents)
    } { idx =>
      idx.asInstanceOf[graft.ml.SemDedupIndex.Index]
        .dedupBatch(skewBatch, "id", "vec", threshold)
        .select(col("batch_id")).distinct().count()
    } { () =>
      import org.apache.spark.sql.graftx.Bridge
      def assign(df: DataFrame) = df.select(col("id"), col("vec"),
        Bridge.column(graft.functions.CentroidProbes(
          Bridge.expression(col("vec")),
          cents.map(c => {
            val nrm = math.max(math.sqrt(c.map(x => x * x).sum), 1e-8)
            c.map(_ / nrm)
          }),
          graft.functions.vector.MetricCosine, 1)).getItem(0).as("cluster"))
      val bAssigned = assign(skewBatch).localCheckpoint(true)
      val wCluster = Window.partitionBy(col("cluster")).orderBy(col("id"))
      val cAssigned = assign(corpus)
        .withColumn("_rn", row_number().over(wCluster))
        .filter(col("_rn") <= 10000).drop("_rn")
      bAssigned.as("b")
        .join(cAssigned.as("c"), col("b.cluster") === col("c.cluster"))
        .filter(graft.functions.vector.cosine_sim(col("b.vec"), col("c.vec"))
          >= threshold)
        .select(col("b.id")).distinct().count()
    }

    println(f"""{"probe":"index_sweep_embed","corpus":$n,"batch":$batchN,"hyperplane":{"build_sec":$hpB%.1f,"indexed_sec":$hpI%.1f,"recompute_sec":$hpR%.1f},"hyper128":{"build_sec":$hp2B%.1f,"indexed_sec":$hp2I%.1f,"recompute_sec":$hp2R%.1f},"semdedup":{"build_sec":$sdB%.1f,"indexed_sec":$sdI%.1f,"recompute_sec":$sdR%.1f},"semdedup_skew":{"build_sec":$skB%.1f,"indexed_sec":$skI%.1f,"recompute_sec":$skR%.1f}}""")
  }
}

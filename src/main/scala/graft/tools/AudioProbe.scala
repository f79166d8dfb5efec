package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{AudioCodec, AudioIndex, AudioPerceptualIndex, Multimodal}

/** Measured evidence for the audio near-dup family at feed scale — the
  * [[VideoProbe]] contrast on the audio modality: matching a fixed batch
  * of clips against a standing corpus either RECOMPUTES corpus window
  * fingerprints from the WAV bytes every run (RIFF parse + PCM decode,
  * O(corpus) container reads — the no-index path) or scans the persisted
  * [[AudioIndex]] fps layout (8-byte fingerprint rows, probe-pruned — the
  * corpus term that stays slim as the feed grows). A twin of the HIGHEST
  * corpus id is planted in the batch; both paths must find it.
  *
  * Run: sbt "runMain graft.tools.AudioProbe [corpusClips] [batchClips]"
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val corpusClips = args.headOption.map(_.toLong).getOrElse(100000L)
    val batchClips = args.lift(1).map(_.toLong).getOrElse(2000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 4 windows per clip, 1000 PCM16 samples each (125 ms at 8000 Hz,
    // ~8 KB WAV per clip). The global segment id is embedded EXACTLY in
    // the first 4 samples (16 bits each, the /32768 round-trip is exact
    // for PCM16-sourced values), so every sid is a DISTINCT window — a
    // pure (sid*k + i*m) mod 65535 pattern collapses to 65,535 content
    // classes at feed scale (the VideoProbe 256-class lesson: every
    // fingerprint then exceeds the df-cap and the corpus degenerates to
    // stop-windows)
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
    val corpus: Dataset[Multimodal.MediaRow] = spark.range(corpusClips)
      .map(id => clip(id, id)).localCheckpoint(true)
    val plantedId = corpusClips - 1
    val batch: Dataset[Multimodal.MediaRow] = spark.range(batchClips - 1)
      .map(id => clip(8000000L + id, 4000000L + id))
      .union(spark.range(1).map(_ => clip(9000000L, plantedId)))
      .localCheckpoint(true)
    println(f"[probe] corpus $corpusClips%,d WAVs x 4 windows x $Win samples, " +
      f"batch $batchClips%,d, twin of corpus id $plantedId%,d planted")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def found(out: DataFrame): Boolean =
      out.filter(col("corpus_id") === plantedId).limit(1).count() == 1L

    // the no-index path: corpus WAVs re-decoded on EVERY match run
    val recomputed = time("recompute: decode corpus + videoNearDupAgainst") {
      found(Multimodal.videoNearDupAgainst(
        Multimodal.audioWindowFingerprints(batch, 125L),
        Multimodal.audioWindowFingerprints(corpus, 125L), minJaccard = 0.5))
    }
    println(s"[probe]   twin found: $recomputed")

    val dir = java.nio.file.Files.createTempDirectory("graft_audio_probe").toString
    val idx = time("AudioIndex.build (decode corpus ONCE, persist fps+sizes)") {
      AudioIndex.build(corpus, dir, windowMs = 125L, minJaccard = 0.5)
    }
    val indexed = time("AudioIndex.dedupBatch (batch decode + slim fps scan)") {
      found(idx.dedupBatch(batch))
    }
    println(s"[probe]   twin found: $indexed")
    require(recomputed && indexed, "both paths must find the planted twin")

    // the term that decides the contest at real feed sizes: per-match
    // corpus READ VOLUME (these synthetic clips are 8 KB and pinned in
    // RAM; production audio is minutes long and lives on object storage,
    // where the recompute leg pays this full volume every run)
    val mediaBytes = corpus.map(_.bytes.length.toLong).reduce(_ + _)
    val fpsBytes = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      du(new java.io.File(idx.fpsPath)) +
        du(new java.io.File(s"$dir/sizes"))
    }
    println(f"[probe] per-match corpus read volume: recompute = container " +
      f"bytes ${mediaBytes / 1e6}%.1f MB; indexed = fps+sizes layouts " +
      f"${fpsBytes / 1e6}%.1f MB (${mediaBytes.toDouble / fpsBytes}%.0fx slimmer)")

    // ---- perceptual leg: recall on PERTURBED twins (the duplicate class
    // a scraped corpus actually contains — remastered gain + requantize),
    // exact-hash recall held next to it as the honest contrast (~0 by
    // construction: a gain shift changes every PCM window hash)
    val pCorpusClips = math.min(corpusClips, 10000L)
    val planted = 200L
    val fresh = 1800L
    val freqTable = Array.tabulate(24)(k =>
      350.0 * math.pow(2800.0 / 350.0, k / 23.0))
    def toneOf(c: Long, f: Int, which: Int): Double = {
      var h = c * 1000003L + f * 7919L + which * 104729L
      h ^= h >>> 13; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      freqTable(((h % 24 + 24) % 24).toInt)
    }
    def toneClip(id: Long, c: Long, gain: Double): Multimodal.MediaRow = {
      val samples = Array.tabulate(16000) { i => // 16 frames x 125 ms @ 8 kHz
        val t = i.toDouble / 8000
        val f = i / 1000
        gain * (0.35 * math.sin(2 * math.Pi * toneOf(c, f, 0) * t) +
          0.35 * math.sin(2 * math.Pi * toneOf(c, f, 1) * t))
      }
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000, samples),
        Multimodal.MediaMeta(0, 0, "wav", 2000L))
    }
    val pCorpus: Dataset[Multimodal.MediaRow] = spark.range(pCorpusClips)
      .map(id => toneClip(id, id, 1.0)).localCheckpoint(true)
    // twins of corpus clips 0, step, 2*step, ...; gains vary per twin
    val step = pCorpusClips / planted
    val pBatch: Dataset[Multimodal.MediaRow] = spark.range(planted)
      .map(i => toneClip(7000000L + i, i * step, 0.3 + 0.002 * (i % 200)))
      .union(spark.range(fresh)
        .map(i => toneClip(7500000L + i, 5000000L + i, 1.0)))
      .localCheckpoint(true)
    println(f"[probe] perceptual leg: corpus $pCorpusClips%,d tone clips, " +
      f"$planted%,d remastered twins + $fresh%,d fresh planted")
    val pd = java.nio.file.Files.createTempDirectory("graft_audio_probe_p").toString
    val pIdx = time("AudioPerceptualIndex.build (decode + FFT corpus once)") {
      AudioPerceptualIndex.build(pCorpus, pd, frameMs = 125L, minJaccard = 0.3)
    }
    val pHits = time("AudioPerceptualIndex.dedupBatch") {
      pIdx.dedupBatch(pBatch)
        .select(col("batch_id"), col("corpus_id")).as[(Long, Long)]
        .collect().toSet
    }
    val pRecall = (0L until planted).count(i =>
      pHits.contains((7000000L + i, i * step))).toDouble / planted
    val pFalse = pHits.count(_._1 >= 7500000L)
    val ed = java.nio.file.Files.createTempDirectory("graft_audio_probe_e").toString
    val eIdx = AudioIndex.build(pCorpus, ed, windowMs = 125L, minJaccard = 0.3)
    val eHits = time("AudioIndex.dedupBatch (exact contrast)") {
      eIdx.dedupBatch(pBatch)
        .select(col("batch_id"), col("corpus_id")).as[(Long, Long)]
        .collect().toSet
    }
    val eRecall = (0L until planted).count(i =>
      eHits.contains((7000000L + i, i * step))).toDouble / planted
    println(f"[probe] remastered-twin recall: perceptual $pRecall%.3f " +
      f"($pFalse false hits on fresh), exact ${eRecall}%.3f — the gap IS " +
      "the family's reason to exist")
    // measured 0.95 at 16-frame clips with gains down to 0.3 (the misses
    // are low-gain twins whose near-tie runner-up swaps eat the short
    // clip's shingle budget); the gate is the floor, the print the number
    require(pRecall >= 0.9, s"perceptual recall $pRecall below 0.9")
    require(eRecall == 0.0, "exact hashes cannot survive a gain shift")

    // ---- landmark leg (r16): recall on TEMPO-stretched twins (3% time-
    // scale modification — same tones, same pitch, scaled timing), the
    // duplicate class the START-ALIGNED frame-word shingles coin-flip on
    // (their grid desynchronizes cumulatively); the frame-word number is
    // held next to it as the honest contrast at the SAME threshold.
    // 32-frame (4 s) clips, the q166 construction: a 16-frame clip's
    // ~13-triple landmark set is variance-bound (measured recall 0.855
    // vs frame-word 0.700 — a real but mushy gap); at 32 frames the
    // per-clip stretched-twin jaccards concentrate (0.385..0.656 vs the
    // frame words' 0.234..0.450 straddle of the threshold)
    def stretchClip(id: Long, c: Long, stretch: Double): Multimodal.MediaRow = {
      val samples = Array.tabulate((32000 * stretch).toInt) { i =>
        val t = i.toDouble / 8000
        val f = (i / (1000.0 * stretch)).toInt
        0.35 * math.sin(2 * math.Pi * toneOf(c, f, 0) * t) +
          0.35 * math.sin(2 * math.Pi * toneOf(c, f, 1) * t)
      }
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000, samples),
        Multimodal.MediaMeta(0, 0, "wav", (4000 * stretch).toLong))
    }
    val lCorpus: Dataset[Multimodal.MediaRow] = spark.range(pCorpusClips)
      .map(id => stretchClip(id, id, 1.0)).localCheckpoint(true)
    val lBatch: Dataset[Multimodal.MediaRow] = spark.range(planted)
      .map(i => stretchClip(7800000L + i, i * step, 1.03))
      .union(spark.range(fresh)
        .map(i => stretchClip(7900000L + i, 6000000L + i, 1.0)))
      .localCheckpoint(true)
    val ld = java.nio.file.Files.createTempDirectory("graft_audio_probe_l").toString
    val lIdx = time("AudioLandmarkIndex.build (decode + FFT corpus once)") {
      graft.multimodal.AudioLandmarkIndex.build(lCorpus, ld,
        frameMs = 125L, minJaccard = 0.3)
    }
    val lHits = time("AudioLandmarkIndex.dedupBatch (tempo twins)") {
      lIdx.dedupBatch(lBatch)
        .select(col("batch_id"), col("corpus_id")).as[(Long, Long)]
        .collect().toSet
    }
    val lRecall = (0L until planted).count(i =>
      lHits.contains((7800000L + i, i * step))).toDouble / planted
    val lFalse = lHits.count(_._1 >= 7900000L)
    val fwd = java.nio.file.Files.createTempDirectory("graft_audio_probe_fw").toString
    val fwIdx = AudioPerceptualIndex.build(lCorpus, fwd,
      frameMs = 125L, minJaccard = 0.3)
    val fwHits = time("AudioPerceptualIndex.dedupBatch (frame-word contrast)") {
      fwIdx.dedupBatch(lBatch)
        .select(col("batch_id"), col("corpus_id")).as[(Long, Long)]
        .collect().toSet
    }
    val fwRecall = (0L until planted).count(i =>
      fwHits.contains((7800000L + i, i * step))).toDouble / planted
    println(f"[probe] 3%%-tempo-twin recall: landmark $lRecall%.3f " +
      f"($lFalse false hits on fresh), frame-word $fwRecall%.3f — the gap " +
      "IS the landmark family's reason to exist")
    require(lRecall >= 0.8, s"landmark tempo recall $lRecall below 0.8")
    require(lRecall >= fwRecall + 0.2,
      s"landmark ($lRecall) must clearly beat frame-word ($fwRecall) on tempo twins")
    spark.stop()
  }
}

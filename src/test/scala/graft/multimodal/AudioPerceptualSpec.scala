package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The perceptual audio family's contract: duplicates the EXACT window
  * hash cannot see — gain-shifted, requantized, resampled — match through
  * the spectral-peak fingerprint, and distinct content does not. Each
  * leg holds the exact geometry's number next to the perceptual one so
  * the contrast is measured, not asserted by vibes.
  */
class AudioPerceptualSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Tone-sequence clips over a CONTINUOUS-TIME definition, so the same
  // clip can be rendered at any sample rate (a true resample, not an
  // interpolation approximation): frame f of clip c plays two tones from
  // a 24-entry log-spaced table, picked by a deterministic scrambled
  // hash — every frame's spectrum differs from its neighbor's, so the
  // peak-word sequence carries per-clip information.
  private val FrameMs = 125L
  private val FreqTable = Array.tabulate(24)(k =>
    350.0 * math.pow(2800.0 / 350.0, k / 23.0))
  private def tone(c: Long, f: Int, which: Int): Double = {
    // splitmix-style scramble: a LINEAR pick (c*a + f*b mod 24) makes
    // "distinct" clips time-shifted copies of each other's tone sequence
    var h = c * 1000003L + f * 7919L + which * 104729L
    h ^= h >>> 13; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    FreqTable(((h % 24 + 24) % 24).toInt)
  }
  private def samples(c: Long, frames: Int, rate: Int, gain: Double): Array[Double] =
    Array.tabulate(frames * rate * FrameMs.toInt / 1000) { i =>
      val t = i.toDouble / rate
      val f = (i.toLong * 1000 / (rate * FrameMs)).toInt
      gain * (0.35 * math.sin(2 * math.Pi * tone(c, f, 0) * t) +
        0.35 * math.sin(2 * math.Pi * tone(c, f, 1) * t))
    }
  private def clip(id: Long, c: Long, rate: Int = 8000,
      gain: Double = 1.0, frames: Int = 32): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "audio",
      AudioCodec.encodeWavPcm16(rate, samples(c, frames, rate, gain)),
      Multimodal.MediaMeta(0, 0, "wav", frames * FrameMs))

  private def media(rows: Multimodal.MediaRow*) = spark.createDataset(rows)

  private def jaccard(fps: org.apache.spark.sql.DataFrame,
      a: Long, b: Long): Double = {
    val sets = fps.as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val (sa, sb) = (sets.getOrElse(a, Set.empty), sets.getOrElse(b, Set.empty))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  test("gain-scaled + requantized twin: perceptual jaccard ~1, exact = 0") {
    val rows = media(
      clip(0L, c = 7L),
      clip(1L, c = 7L, gain = 0.4), // re-mastered copy: gain 0.4, re-quantized
      clip(2L, c = 8L)) // distinct content
    val per = Multimodal.audioSpectralFingerprints(rows, FrameMs)
    val jTwin = jaccard(per, 0L, 1L)
    val jDistinct = jaccard(per, 0L, 2L)
    // a frame whose two tones share a band leaves the runner-up at
    // leakage level, where requantization noise can swap it — each such
    // swap costs at most `shingle` set elements, so the twin sits well
    // above the 0.3 match threshold but below 1.0 (measured ~0.61 here)
    assert(jTwin >= 0.5, s"perceptual twin jaccard $jTwin must clear the " +
      "0.3 match threshold with margin")
    assert(jDistinct <= 0.1, s"distinct-content jaccard $jDistinct should be ~0")
    // the honest contrast: the exact window hash sees NOTHING shared
    val exact = Multimodal.audioWindowFingerprints(rows, FrameMs)
      .select(col("media_id"), col("fp"))
    assert(jaccard(exact, 0L, 1L) == 0.0,
      "exact window hashes must not survive a gain shift")
  }

  test("resampled twin (same content rendered at 16 kHz): perceptual match") {
    val rows = media(
      clip(0L, c = 3L),
      clip(1L, c = 3L, rate = 16000), // same continuous content, 2x rate
      clip(2L, c = 4L))
    val per = Multimodal.audioSpectralFingerprints(rows, FrameMs)
    val jTwin = jaccard(per, 0L, 1L)
    val jDistinct = jaccard(per, 0L, 2L)
    assert(jTwin >= 0.5, s"resampled twin jaccard $jTwin should clear 0.5")
    assert(jDistinct <= 0.1, s"distinct-content jaccard $jDistinct should be ~0")
    val exact = Multimodal.audioWindowFingerprints(rows, FrameMs)
      .select(col("media_id"), col("fp"))
    assert(jaccard(exact, 0L, 1L) == 0.0,
      "exact window hashes must not survive resampling")
  }

  test("index path: gain twin matches its source through the persisted " +
    "index; distinct clip matches nothing; exact index sees neither") {
    val corpus = media((0L until 6L).map(c => clip(c, c)): _*)
    val dirP = java.nio.file.Files.createTempDirectory("graft_apidx").toString
    val idxP = AudioPerceptualIndex.build(corpus, dirP,
      frameMs = FrameMs, minJaccard = 0.3)
    val batch = media(
      clip(100L, c = 2L, gain = 0.5), // re-mastered twin of corpus clip 2
      clip(101L, c = 50L)) // fresh content
    val hits = idxP.dedupBatch(batch)
      .select(col("batch_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((100L, 2L)), s"got $hits")
    // meta round-trip: a reloaded index keeps the geometry
    val reloaded = AudioPerceptualIndex.load(spark, dirP)
    assert(reloaded.frameMs == FrameMs && reloaded.bands == 32 &&
      reloaded.shingle == 4 && reloaded.minJaccard == 0.3)
    assert(reloaded.dedupBatch(batch)
      .select(col("batch_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet == Set((100L, 2L)))
    // the exact family on the same split: the twin is invisible
    val dirE = java.nio.file.Files.createTempDirectory("graft_aeidx").toString
    val idxE = AudioIndex.build(corpus, dirE, windowMs = FrameMs, minJaccard = 0.1)
    assert(idxE.dedupBatch(batch).count() == 0L,
      "the exact index must not see the gain-scaled twin (that is the gap " +
        "the perceptual family exists to close)")
  }

  test("ingest through the shared MediaSetIndex walk: gain twins dropped, " +
    "fresh clips appended and found by the next batch") {
    val corpus = media((0L until 4L).map(c => clip(c, c, frames = 16)): _*)
    val dir = java.nio.file.Files.createTempDirectory("graft_apidx_ing").toString
    val idx = AudioPerceptualIndex.build(corpus, dir,
      frameMs = FrameMs, minJaccard = 0.3)
    val batch1 = media(
      clip(100L, c = 1L, gain = 0.7, frames = 16), // twin of corpus 1 -> drop
      clip(101L, c = 40L, frames = 16)) // fresh -> kept + appended
    val kept1 = idx.ingestBatch(batch1).select(col("media_id"))
      .as[Long].collect().toSet
    assert(kept1 == Set(101L), s"got $kept1")
    // a later batch's gain twin of the JUST-APPENDED clip must now drop
    val batch2 = media(clip(200L, c = 40L, gain = 0.5, frames = 16))
    val kept2 = idx.ingestBatch(batch2).select(col("media_id"))
      .as[Long].collect().toSet
    assert(kept2 == Set.empty[Long],
      "a twin of an ingested clip must match the standing index")
  }

  test("hopMs overlap buys trim robustness: a 47 ms-trimmed twin matches " +
    "through an overlapped index where the non-overlapping grid loses it") {
    // trim = drop the first 47 ms (an awkward offset: not a frame or hop
    // multiple). Continuous-time rendering makes this a true re-cut.
    def trimmed(id: Long, c: Long, trimMs: Int): Multimodal.MediaRow = {
      val all = samples(c, 32, 8000, 1.0)
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000, all.drop(8 * trimMs)),
        Multimodal.MediaMeta(0, 0, "wav", 32 * FrameMs - trimMs))
    }
    val rows = media(clip(0L, c = 5L), trimmed(1L, c = 5L, 47), clip(2L, c = 6L))
    val jDefault = jaccard(
      Multimodal.audioSpectralFingerprints(rows, FrameMs), 0L, 1L)
    val jHop = jaccard(
      Multimodal.audioSpectralFingerprints(rows, FrameMs, hopMs = 25L), 0L, 1L)
    val jHopDistinct = jaccard(
      Multimodal.audioSpectralFingerprints(rows, FrameMs, hopMs = 25L), 0L, 2L)
    assert(jHop >= 0.3, s"overlapped trim jaccard $jHop must clear the " +
      s"0.3 match threshold (non-overlapping measured $jDefault)")
    assert(jHop > jDefault,
      s"overlap must strictly improve trim recall: hop=$jHop default=$jDefault")
    assert(jHopDistinct <= 0.1, s"distinct content stays unmatched: $jHopDistinct")
    // end to end through a persisted overlapped index + meta round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_apidx_hop").toString
    val idx = AudioPerceptualIndex.build(media((0L until 4L).map(c =>
      clip(c, c)): _*), dir, frameMs = FrameMs, minJaccard = 0.3, hopMs = 25L)
    val reloaded = AudioPerceptualIndex.load(spark, dir)
    assert(reloaded.hopMs == 25L, "hop is index state, restored by load")
    val hits = reloaded.dedupBatch(media(trimmed(100L, c = 2L, 47)))
      .select(col("batch_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((100L, 2L)), s"got $hits")
  }

  test("trimSilence: padded-lead-in duplicates match through trim-armed " +
    "indexes (exact AND perceptual) where untrimmed alignment loses them") {
    // padded twin: 300 ms of true silence prepended + 150 ms appended —
    // the encoder-padding / different-rip duplicate class. 300 is not a
    // 125 ms frame multiple, so untrimmed alignment shifts every window.
    def padded(id: Long, c: Long, gain: Double): Multimodal.MediaRow = {
      val content = samples(c, 16, 8000, gain)
      val sam = new Array[Double](2400) ++ content ++ new Array[Double](1200)
      Multimodal.MediaRow(id, "audio",
        AudioCodec.encodeWavPcm16(8000, sam),
        Multimodal.MediaMeta(0, 0, "wav", 16 * FrameMs + 450))
    }
    val corpus = media((0L until 4L).map(c => clip(c, c, frames = 16)): _*)
    val batch = media(
      padded(100L, c = 1L, gain = 1.0), // exact content, padded -> both families
      padded(101L, c = 2L, gain = 0.5), // padded AND remastered -> perceptual only
      padded(102L, c = 30L, gain = 1.0)) // fresh content, padded -> nobody
    // untrimmed indexes: alignment loss, nothing matches
    val e0 = AudioIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_trim_e0").toString,
      windowMs = FrameMs, minJaccard = 0.3)
    assert(e0.dedupBatch(batch).count() == 0L,
      "untrimmed exact index must lose the padded twins (the gap trim closes)")
    // trim-armed exact index: the byte-exact padded twin matches at J=1
    val e1 = AudioIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_trim_e1").toString,
      windowMs = FrameMs, minJaccard = 0.3, trimSilenceRel = 0.01)
    val eHits = e1.dedupBatch(batch)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(eHits == Set((100L, 1L, 1.0)), s"got $eHits")
    // trim-armed perceptual index: padded + remastered matches too
    val p1 = AudioPerceptualIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_trim_p1").toString,
      frameMs = FrameMs, minJaccard = 0.3, trimSilenceRel = 0.01)
    val pHits = p1.dedupBatch(batch)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(pHits == Set((100L, 1L), (101L, 2L)), s"got $pHits")
    // meta round-trip keeps the gate
    assert(AudioIndex.load(spark, e1.path).trimSilenceRel == 0.01)
    assert(AudioPerceptualIndex.load(spark, p1.path).trimSilenceRel == 0.01)
  }

  test("trimSilence kernel: relative gate is gain-invariant; all-silent " +
    "and gateless clips unchanged") {
    val content = samples(9L, 8, 8000, 1.0)
    val padded = new Array[Double](800) ++ content ++ new Array[Double](400)
    val t1 = AudioCodec.trimSilence(AudioCodec.RawAudio(8000, 1, padded))
    assert(t1.samples.length == content.length,
      s"trim must recover the content extent, got ${t1.samples.length} " +
        s"vs ${content.length}")
    assert(t1.samples.sameElements(content), "trim must be sample-exact")
    // gain invariance of the RELATIVE gate: scaling moves peak and frame
    // RMS together, so the trim boundaries are identical
    val t2 = AudioCodec.trimSilence(
      AudioCodec.RawAudio(8000, 1, padded.map(_ * 0.05)))
    assert(t2.samples.length == content.length,
      "the relative gate must trim identically under gain")
    // all-silent clip: unchanged (no onset to align to)
    val silent = AudioCodec.RawAudio(8000, 1, new Array[Double](4000))
    assert(AudioCodec.trimSilence(silent).samples.length == 4000)
    // no silence: unchanged
    assert(AudioCodec.trimSilence(AudioCodec.RawAudio(8000, 1, content))
      .samples.sameElements(content))
  }

  test("trimSilence: a loud trailing PARTIAL frame survives a silent last " +
    "full frame; a sub-gate partial trims with the silent tail") {
    // frame = 80 samples at 8 kHz; content ends 40 samples past a frame
    // boundary with one silent FULL frame in between — pre-fix the scan
    // stopped at the last non-silent full frame and cut the real tail
    val tone = Array.tabulate(240)(i =>
      math.sin(2 * math.Pi * 440.0 * i / 8000.0))
    val loudTail = Array.tabulate(40)(i => math.sin(i * 0.7))
    val reopened = AudioCodec.trimSilence(AudioCodec.RawAudio(8000, 1,
      tone ++ new Array[Double](80) ++ loudTail))
    assert(reopened.samples.length == 360,
      s"loud partial must reopen the tail, got ${reopened.samples.length}")
    // sub-gate partial after a silent full frame: both trim away
    val cut = AudioCodec.trimSilence(AudioCodec.RawAudio(8000, 1,
      tone ++ new Array[Double](80) ++ new Array[Double](40)))
    assert(cut.samples.length == 240,
      s"silent tail (full + partial) must trim, got ${cut.samples.length}")
  }

  test("peakBandWords: exact gain invariance and framing contract") {
    val raw = AudioCodec.RawAudio(8000, 1, samples(11L, 8, 8000, 1.0))
    val words = AudioCodec.peakBandWords(raw, FrameMs, 32)
    assert(words.length == 8, "one word per full frame")
    val scaled = AudioCodec.RawAudio(8000, 1,
      raw.samples.map(_ * 0.125)) // pure scale, no requantization
    assert(AudioCodec.peakBandWords(scaled, FrameMs, 32).sameElements(words),
      "peak-rank words are EXACTLY invariant to a positive gain")
    // too-short clip: no full frame
    assert(AudioCodec.peakBandWords(
      AudioCodec.RawAudio(8000, 1, new Array[Double](999)), FrameMs, 32).isEmpty)
  }
}

package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The landmark family's contract: a small TEMPO edit — the duplicate
  * class neither the exact window hash nor the start-aligned frame-word
  * shingles survive reliably — matches through Δt-binned peak-event
  * landmarks, and distinct content does not. Clips hold each tone for
  * TWO frames (notes outlive frames, the realistic shape): frame-word
  * geometry then depends on how far the stretched grid has drifted at
  * each tone boundary (a coin flip per clip, measured in the q166 row),
  * while the EVENT sequence is tempo-invariant and the log2 gap bins
  * absorb the run-length scaling.
  */
class AudioLandmarkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val FrameMs = 125L
  private val FreqTable = Array.tabulate(24)(k =>
    350.0 * math.pow(2800.0 / 350.0, k / 23.0))
  private def tone(c: Long, f: Int, which: Int): Double = {
    var h = c * 1000003L + f * 7919L + which * 104729L
    h ^= h >>> 13; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    FreqTable(((h % 24 + 24) % 24).toInt)
  }
  /** `stretch` is the TEMPO factor: every (2-frame) note lasts
    * 2 x FrameMs x stretch ms — same tone sequence, same pitch, scaled
    * timing (time-scale modification, not resampling).
    */
  private def samples(c: Long, frames: Int, rate: Int,
      stretch: Double): Array[Double] =
    Array.tabulate((frames * rate * FrameMs.toInt / 1000 * stretch).toInt) { i =>
      val t = i.toDouble / rate
      val f = (i / (rate * FrameMs * 2 * stretch / 1000.0)).toInt
      0.35 * math.sin(2 * math.Pi * tone(c, f, 0) * t) +
        0.35 * math.sin(2 * math.Pi * tone(c, f, 1) * t)
    }
  private def clip(id: Long, c: Long, stretch: Double = 1.0): Multimodal.MediaRow =
    Multimodal.MediaRow(id, "audio",
      AudioCodec.encodeWavPcm16(8000, samples(c, 32, 8000, stretch)),
      Multimodal.MediaMeta(0, 0, "wav", (4000 * stretch).toLong))

  private def jac(x: Set[Long], y: Set[Long]): Double =
    if (x.isEmpty || y.isEmpty) 0.0
    else x.intersect(y).size.toDouble / x.union(y).size

  test("landmarkWords kernel: tempo-invariant event sequence — 3% stretch " +
    "keeps most landmarks, distinct content shares ~none, gain drops out") {
    def lm(c: Long, stretch: Double, gain: Double = 1.0) =
      AudioCodec.landmarkWords(AudioCodec.RawAudio(8000, 1,
        samples(c, 32, 8000, stretch).map(_ * gain)), FrameMs, 32).toSet
    (0L to 9L).foreach { c =>
      val twin = jac(lm(c, 1.0), lm(c, 1.03))
      assert(twin >= 0.3, s"clip $c: stretched twin jaccard $twin < 0.3")
      val cross = (0L to 9L).filter(_ != c)
        .map(o => jac(lm(c, 1.03), lm(o, 1.0))).max
      assert(cross < 0.1, s"clip $c: distinct-content jaccard $cross")
    }
    // gain invariance rides on the peak-rank construction
    assert(lm(3L, 1.0, gain = 0.05) == lm(3L, 1.0))
    // degenerate inputs: under 3 peak events -> no landmarks
    assert(AudioCodec.landmarkWords(
      AudioCodec.RawAudio(8000, 1, samples(0L, 2, 8000, 1.0)),
      FrameMs, 32).isEmpty)
  }

  test("index path: 3%-stretched twin matches through the landmark index " +
    "at DEFAULT thresholds where the frame-word index loses it") {
    // clip 9 measures fw twin-jaccard 0.289 (< the family's 0.3 default)
    // vs lm 0.471 — the structural contrast, not a tuned threshold
    val corpus = spark.createDataset((0L until 10L).map(c => clip(c, c)))
    val lmIdx = AudioLandmarkIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_lmidx").toString)
    val fwIdx = AudioPerceptualIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_fwidx").toString)
    val batch = spark.createDataset(Seq(
      clip(109L, 9L, stretch = 1.03), // tempo twin of corpus clip 9
      clip(159L, 59L))) // fresh content
    val lmHits = lmIdx.dedupBatch(batch)
      .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(lmHits == Set((109L, 9L)),
      s"landmark index must recover exactly the tempo twin, got $lmHits")
    val fwHits = fwIdx.dedupBatch(batch)
      .select($"batch_id").as[Long].collect().toSet
    assert(!fwHits.contains(109L),
      "the start-aligned frame-word geometry loses this tempo twin " +
        "(the measured contrast the landmark family exists for)")
    // lifecycle is MediaSetIndex-inherited: append + reload + rematch
    assert(lmIdx.ingestBatch(batch).select($"media_id").as[Long]
      .collect().toSet == Set(159L), "twin drops, fresh clip survives")
    val reloaded = AudioLandmarkIndex.load(spark, lmIdx.path)
    assert(reloaded.frameMs == 125L && reloaded.minJaccard == 0.3)
    val again = reloaded.dedupBatch(spark.createDataset(Seq(
      clip(259L, 59L, stretch = 1.03)))) // tempo twin of the INGESTED clip
      .select($"corpus_id").as[Long].collect().toSet
    assert(again == Set(159L),
      "later batches match tempo twins of ingested survivors")
  }

  test("minShared guard: shared >= min(minShared, |A|, |B|) — exact " +
    "re-uploads always pass, partial-overlap twins block at a floor " +
    "their intersection cannot clear; the floor persists through load") {
    val corpus = spark.createDataset((0L until 10L).map(c => clip(c, c)))
    // minShared far above any set size: the size-aware min() clamps the
    // requirement to |A| and |B| in full — ONLY complete-set matches
    // (exact re-uploads) survive, which is exactly the semantics that
    // keeps degenerate tiny-set re-uploads matchable where a flat
    // absolute floor would orphan them
    val guarded = AudioLandmarkIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_lmguard_spec").toString,
      minJaccard = 0.3, minShared = 1000)
    val batch = spark.createDataset(Seq(
      clip(100L, 0L), // exact re-upload: shared == |A| == |B|
      clip(101L, 9L, stretch = 1.03), // tempo twin (lm J=0.471): partial overlap
      clip(102L, 50L))) // fresh content
    val hits = guarded.dedupBatch(batch)
      .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((100L, 0L)),
      s"full-set matches only under the clamped floor, got $hits")
    // the same batch through an UNGUARDED build recovers the tempo twin —
    // the guard, not the geometry, made the distinction above
    val unguarded = AudioLandmarkIndex.build(corpus,
      java.nio.file.Files.createTempDirectory("graft_lmfree_spec").toString,
      minJaccard = 0.3)
    val freeHits = unguarded.dedupBatch(batch)
      .select($"batch_id").as[Long].collect().toSet
    assert(freeHits == Set(100L, 101L), s"unguarded baseline, got $freeHits")
    // the floor is INDEX STATE: load round-trips it and matches identically
    val reloaded = AudioLandmarkIndex.load(spark, guarded.path)
    assert(reloaded.minShared == 1000)
    assert(reloaded.dedupBatch(batch)
      .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
      == hits, "loaded index must apply the persisted floor")
  }

  test("EpochIndex lifecycle inheritance: asOf pin + vacuum on the " +
    "landmark family") {
    val idx = AudioLandmarkIndex.build(
      spark.createDataset((0L until 3L).map(c => clip(c, c))),
      java.nio.file.Files.createTempDirectory("graft_lm_asof").toString)
    idx.ingestBatch(spark.createDataset(Seq(clip(3L, 30L)))) // epoch 1
    idx.ingestBatch(spark.createDataset(Seq(clip(4L, 40L)))) // epoch 2
    val twin4 = spark.createDataset(Seq(clip(104L, 40L, stretch = 1.03)))
    def hits(asOf: Option[Long]) = idx.dedupBatch(twin4, asOf = asOf)
      .select($"corpus_id").as[Long].collect().toSet
    assert(hits(None) == Set(4L))
    assert(hits(Some(1L)).isEmpty, "clip 4 does not exist at the pin")
    assert(idx.vacuum(keepLast = 1) == 2, "epochs 0+1 fold")
    assert(intercept[IllegalArgumentException] { hits(Some(1L)) }
      .getMessage.contains("not in the committed history"))
    assert(hits(Some(2L)) == Set(4L),
      "the kept pin resolves through the fold slice")
  }
}

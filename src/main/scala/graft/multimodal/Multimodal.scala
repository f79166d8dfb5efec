package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in batch-shaped passes.
  *
  * IMAGE decode is real (PPM/BMP hand-rolled + PNG/JPEG/GIF via the JDK's
  * `javax.imageio` — see [[ImageCodec]]). AUDIO decode is real (WAV
  * PCM/float hand-rolled + AIFF/AU via the JDK's `javax.sound.sampled` —
  * see [[AudioCodec]]); compressed audio (MP3/AAC/OGG) has no JVM decoder.
  * VIDEO frame extraction is the one remaining STUB — the JDK ships no
  * video codecs. Everything Spark-side is real and tested either way: the
  * schema, the partition-preserving batched iteration (the Scala analog of
  * a batched inference UDF: accumulate a bounded batch, run the kernel once
  * per batch, emit rows), the frame-sampling generator shape, and the
  * feature columns that feed the vector engine downstream. Swapping a model
  * into `DecodeKernel` changes no plumbing.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, format: String, duration_ms: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  case class Frame(media_id: Long, frame_index: Int, ts_ms: Long, frame_bytes: Array[Byte])

  /** The pluggable per-batch kernel: N media blobs in, N feature vectors out.
    * Real deployments put codec + model inference here.
    */
  trait DecodeKernel extends Serializable {
    def dim: Int
    def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]]
  }

  /** STUB kernel: deterministic pseudo-features derived from the bytes
    * (xxhash-seeded), unit-norm. Stands in for codec+model until real
    * libraries are available; keeps every pipeline downstream testable.
    */
  case class StubDecodeKernel(dim: Int = 64) extends DecodeKernel {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]] =
      batch.map { row =>
        var h = 1125899906842597L
        row.bytes.foreach(b => h = 31 * h + b)
        val rnd = new java.util.Random(h)
        val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
        val inv = (1.0 / math.max(math.sqrt(v.map(x => x.toDouble * x).sum), 1e-8)).toFloat
        v.map(_ * inv)
      }
  }

  /** REAL image kernel (PPM/BMP/PNG/JPEG/GIF — all JVM-native, see
    * [[ImageCodec]]): decode -> box-average resize -> L1-normalized RGB
    * histogram. Bytes without a JVM decoder (audio/video containers,
    * corrupt payloads) follow the `undecodable` policy: "error" (default)
    * or "stub" (deterministic stand-in features, keeping mixed corpora
    * flowing).
    */
  case class RawImageKernel(
      binsPerChannel: Int = 4,
      resizeTo: Int = 64,
      undecodable: String = "error") extends DecodeKernel {
    require(Seq("error", "stub").contains(undecodable),
      s"undecodable policy must be error|stub, got $undecodable")
    override def dim: Int = binsPerChannel * binsPerChannel * binsPerChannel
    private lazy val stub = StubDecodeKernel(dim)
    override def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]] =
      batch.map { row =>
        // the policy covers DECODE FAILURES too, not just unknown magic —
        // a 32-bpp/RLE BMP passes canDecode but throws in the decoder, and
        // under "stub" one such row must not kill the whole job
        val decoded: Option[ImageCodec.RawImage] =
          if (!ImageCodec.canDecode(row.bytes)) None
          else scala.util.Try(ImageCodec.decode(row.bytes)) match {
            case scala.util.Success(img) => Some(img)
            case scala.util.Failure(e) if undecodable == "stub" => None
            case scala.util.Failure(e) => throw new IllegalArgumentException(
              s"media ${row.media_id}: decode failed (${e.getMessage})")
          }
        decoded match {
          case Some(img) =>
            ImageCodec.rgbHistogram(
              ImageCodec.resize(img, resizeTo, resizeTo), binsPerChannel)
          case None if undecodable == "stub" => stub.decodeBatch(Seq(row)).head
          case None => throw new IllegalArgumentException(
            s"media ${row.media_id}: no JVM decoder for format '${row.meta.format}' " +
              "(decodable: ppm, bmp, png, jpeg, gif)")
        }
      }
  }

  /** REAL audio kernel (WAV PCM/float, AIFF, AU — all JVM-native, see
    * [[AudioCodec]]): decode -> mono mix -> [rms, peak, zero-crossing rate]
    * ++ an L1-normalized RMS energy envelope over `envelopeBins` equal time
    * windows (duration-invariant, so clips of any length share one vector
    * space). Bytes without a JVM decoder (MP3/AAC/OGG, corrupt payloads)
    * follow the `undecodable` policy, exactly like [[RawImageKernel]].
    */
  case class RawAudioKernel(
      envelopeBins: Int = 16,
      undecodable: String = "error") extends DecodeKernel {
    require(Seq("error", "stub").contains(undecodable),
      s"undecodable policy must be error|stub, got $undecodable")
    override def dim: Int = 3 + envelopeBins
    private lazy val stub = StubDecodeKernel(dim)
    override def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]] =
      batch.map { row =>
        // policy covers decode FAILURES too (e.g. an ADPCM WAV passes the
        // magic check but has no decoder), mirroring RawImageKernel
        val decoded: Option[AudioCodec.RawAudio] =
          if (!AudioCodec.canDecode(row.bytes)) None
          else scala.util.Try(AudioCodec.decode(row.bytes)) match {
            case scala.util.Success(a) => Some(a)
            case scala.util.Failure(_) if undecodable == "stub" => None
            case scala.util.Failure(e) => throw new IllegalArgumentException(
              s"media ${row.media_id}: audio decode failed (${e.getMessage})")
          }
        decoded match {
          case Some(a) => AudioCodec.features(a, envelopeBins)
          case None if undecodable == "stub" => stub.decodeBatch(Seq(row)).head
          case None => throw new IllegalArgumentException(
            s"media ${row.media_id}: no JVM decoder for format '${row.meta.format}' " +
              "(decodable: wav pcm/float, aiff, au)")
        }
      }
  }

  /** Batched feature extraction: partition-local, bounded batches of
    * `batchSize` rows per kernel call (the batch shape a GPU model wants).
    * No shuffle — runs where the data lives.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      kernel: DecodeKernel,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = kernel.decodeBatch(batch)
        require(feats.length == batch.length,
          s"kernel returned ${feats.length} features for ${batch.length} inputs")
        batch.zip(feats).map { case (r, f) => MediaFeatures(r.media_id, r.kind, f) }
      }
    }
  }

  /** Frame sampling for video rows: one row per sampled timestamp. REAL
    * for AVI containers ([[VideoCodec]] demux — MJPEG payloads come out as
    * standalone JPEGs that [[RawImageKernel]]/[[ImageCodec]] decode
    * directly, cadence and duration from the container header); STUB for
    * codec-compressed containers (MP4/MKV — no JVM decoder), where the
    * deterministic stand-in tags the container bytes with the offset so the
    * generator shape stays testable end to end.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(everyMs >= 1, s"everyMs must be >= 1, got $everyMs")
    media.filter(_.kind == "video").flatMap { row =>
      if (VideoCodec.canDemux(row.bytes)) {
        val avi = VideoCodec.demuxAvi(row.bytes)
        val n = (avi.durationMs / everyMs).toInt
        (0 to n).map { i =>
          val ts = i * everyMs
          Frame(row.media_id, i, ts, avi.frames(avi.frameIndexAt(ts)))
        }
      } else {
        val n = (row.meta.duration_ms / everyMs).toInt
        (0 to n).map { i =>
          val ts = i * everyMs
          val tag = java.nio.ByteBuffer.allocate(8).putLong(ts).array()
          Frame(row.media_id, i, ts, tag ++ row.bytes.take(8))
        }
      }
    }
  }

  /** Deterministic synthetic media table for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val rnd = new java.util.Random(seed + i)
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = new Array[Byte](64 + rnd.nextInt(64))
      rnd.nextBytes(bytes)
      MediaRow(i.toLong, kind, bytes,
        MediaMeta(640, 480, if (kind == "image") "png" else "mkv",
          if (kind == "video") 1000L + rnd.nextInt(4000) else 0L))
    }
    spark.createDataset(rows)
  }

  /** Perceptual fingerprints for image rows: (media_id, fp) with fp =
    * [[ImageCodec.dHash]] over the decoded image. Partition-local decode,
    * no shuffle; rows whose bytes no JVM codec handles are dropped (they
    * can't be perceptually compared) — count the difference against the
    * input if the pipeline needs an audit trail.
    */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .flatMap { row =>
        // Try covers decode FAILURES too (truncated payloads pass the
        // magic check) — one corrupt row must not kill a corpus-wide
        // fingerprint pass; the RawImageKernel "stub" policy rationale
        if (!ImageCodec.canDecode(row.bytes)) None
        else scala.util.Try(
          ImageCodec.dHash(ImageCodec.decode(row.bytes))).toOption
          .map((row.media_id, _))
      }
      .toDF("media_id", "fp")
  }

  /** Image near-duplicate pairs: dHash fingerprints fed through the same
    * banded Hamming engine as text SimHash ([[graft.operators.Dedup
    * .nearDupPairsHamming64]]) — recall guaranteed for hamming < nBands,
    * exact-Hamming verify, deterministic bucket caps. The decode pass is
    * the only image-specific work; candidate generation shuffles ONLY
    * (id, fp) longs, never pixels.
    *
    * Output: (id_a, id_b, hamming) with id_a < id_b.
    */
  def imageNearDupPairs(
      media: Dataset[MediaRow],
      maxHamming: Int = 3,
      nBands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    graft.operators.Dedup.nearDupPairsHamming64(
      imageDHash(media), "media_id", "fp", maxHamming, nBands, maxBucketSize)

  /** Per-video frame-fingerprint sets: (media_id, fp) DISTINCT rows, one
    * fingerprint per distinct sampled frame. `perceptual = false` (default)
    * fingerprints the raw payload bytes (xxhash64, codegen'd) — exact
    * frame-content identity, the first-pass video dedup signal (re-muxed
    * copies of the same stream share every fp). `perceptual = true` decodes
    * each frame with [[ImageCodec]] and takes its 64-bit dHash — re-encoded
    * frames (same pixels, different bytes) collide as in [[imageDHash]];
    * frames no JVM codec decodes are dropped.
    *
    * Scale shape: demux + fingerprint run partition-local where the video
    * bytes live; only (media_id, fp) longs ever reach the distinct
    * exchange — frame payloads never shuffle (plan-guarded).
    */
  def videoFrameFingerprints(
      media: Dataset[MediaRow],
      everyMs: Long,
      perceptual: Boolean = false): DataFrame = {
    import media.sparkSession.implicits._
    val frames = sampleFrames(media, everyMs)
    val withFp =
      if (perceptual)
        frames.flatMap { fr =>
          // Try covers decode FAILURES (a truncated JPEG frame passes the
          // magic check): a poison frame must not wedge the job — or, via
          // the ingest stream, wedge checkpoint replay forever
          if (!ImageCodec.canDecode(fr.frame_bytes)) None
          else scala.util.Try(
            ImageCodec.dHash(ImageCodec.decode(fr.frame_bytes))).toOption
            .map((fr.media_id, _))
        }.toDF("media_id", "fp")
      else
        frames.toDF().select(col("media_id"),
          xxhash64(col("frame_bytes")).as("fp"))
    withFp.distinct()
  }

  /** Drop fingerprints whose id list exceeds `maxIdsPerFp` — the shared
    * df-cap of the media set-overlap family (stop-frames / stop-windows).
    * Input and output are (id, h) set tables.
    */
  private[multimodal] def dfCapped(sets: DataFrame, maxIdsPerFp: Int): DataFrame =
    if (maxIdsPerFp == Int.MaxValue) sets
    else sets.join(
      sets.groupBy(col("h")).agg(count(lit(1)).as("_nv"))
        .filter(col("_nv") <= maxIdsPerFp).select(col("h")),
      Seq("h"))

  /** (id, n) set sizes of an (id, h) set table. */
  private[multimodal] def setSizes(sets: DataFrame): DataFrame =
    sets.groupBy(col("id")).agg(count(lit(1)).as("n"))

  /** Attach both set sizes to an (aCol, bCol, shared) pair-count frame,
    * add the Jaccard, keep rows at or above `minJaccard` — the shared
    * assembly of the media set-overlap family. `sizesA`/`sizesB` are
    * (id, n) frames; WHICH universe they count (kept vs full) is each
    * operator's documented semantic choice.
    */
  private[multimodal] def jaccardFiltered(
      shared: DataFrame, aCol: String, bCol: String,
      sizesA: DataFrame, sizesB: DataFrame,
      sizeACol: String, sizeBCol: String, minJaccard: Double): DataFrame =
    shared
      .join(sizesA.select(col("id").as(aCol), col("n").as(sizeACol)), Seq(aCol))
      .join(sizesB.select(col("id").as(bCol), col("n").as(sizeBCol)), Seq(bCol))
      .withColumn("jaccard", col("shared").cast("double") /
        (col(sizeACol) + col(sizeBCol) - col("shared")))
      .filter(col("jaccard") >= minJaccard)
      .select(col(aCol), col(bCol), col("shared"),
        col(sizeACol), col(sizeBCol), col("jaccard"))

  /** Video near-duplicate pairs by frame-set overlap: two videos are
    * near-dups when the Jaccard similarity of their sampled-frame
    * fingerprint sets reaches `minJaccard` — the standard first pass for
    * video dedup in a multimodal training corpus (re-uploads, trims, and
    * re-muxes share most frames; unrelated videos share none).
    *
    * Output: (id_a, id_b, shared, size_a, size_b, jaccard DOUBLE) with
    * id_a < id_b, jaccard >= minJaccard.
    *
    * Scale shape — the [[graft.operators.Dedup.sourceOverlap]] discipline:
    * fingerprints appearing in more than `maxVideosPerFp` videos are
    * DROPPED before the pair join (stop-frames: black frames, station
    * idents, intro cards — precisely the frames that would both blow up
    * the pairwise term and carry no dedup signal; symmetric, no id bias).
    * Set sizes are counted over the kept universe, so the Jaccard stays
    * consistent with its own candidate generation. Only (fp, id) longs
    * shuffle; the pairwise term is bounded by maxVideosPerFp² per
    * fingerprint.
    */
  def videoNearDupPairs(
      fps: DataFrame,
      idCol: String = "media_id",
      fpCol: String = "fp",
      minJaccard: Double = 0.5,
      maxVideosPerFp: Int = 1000): DataFrame = {
    require(minJaccard >= 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in [0, 1], got $minJaccard")
    require(maxVideosPerFp >= 2,
      s"maxVideosPerFp must be >= 2 (pairs need two videos), got $maxVideosPerFp")
    val sets = fps.select(col(idCol).cast("long").as("id"),
      col(fpCol).cast("long").as("h")).distinct()
    val kept = dfCapped(sets, maxVideosPerFp)
    // kept-universe sizes: the drop redefines the similarity universe
    val sizes = setSizes(kept)
    val shared = kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    jaccardFiltered(shared, "id_a", "id_b", sizes, sizes,
      "size_a", "size_b", minJaccard)
  }

  /** Per-clip audio window fingerprints: (media_id, fp) DISTINCT rows, one
    * fingerprint per distinct `windowMs` window of the decoded mono
    * signal — the audio analog of [[videoFrameFingerprints]], feeding the
    * same set-overlap operators ([[videoNearDupPairs]] /
    * [[videoNearDupAgainst]] / [[VideoIndex]] are generic over (id, fp)
    * tables). Each full window's samples are requantized to PCM16 (exact
    * for PCM16-sourced audio: decode divides by 32768, the round-trip
    * recovers the stored int) and content-hashed, so clips sharing
    * window-aligned PCM segments — re-uploads, concatenations of the same
    * material, padded tails — overlap in fingerprint space. Windows are
    * aligned to the clip start and the trailing partial window is dropped:
    * a mid-window trim shifts alignment and breaks matching (content
    * identity, not acoustic similarity — the perceptual leg is the
    * envelope-feature kNN path via [[RawAudioKernel]]). Rows no JVM codec
    * decodes are dropped.
    *
    * Scale shape: decode + window + requantize run partition-local; the
    * codegen'd xxhash64 collapses each window to a long before the
    * distinct exchange — PCM bytes never shuffle.
    */
  def audioWindowFingerprints(
      media: Dataset[MediaRow], windowMs: Long,
      trimSilenceRel: Double = 0.0): DataFrame = {
    import media.sparkSession.implicits._
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    media.filter(_.kind == "audio").flatMap { row =>
      // Try covers decode FAILURES too (an ADPCM WAV passes the RIFF
      // magic check but has no decoder) — dropped, per the contract above
      val decoded =
        if (!AudioCodec.canDecode(row.bytes)) None
        else scala.util.Try(AudioCodec.decode(row.bytes)).toOption
          .map(r => if (trimSilenceRel > 0)
            AudioCodec.trimSilence(r, trimSilenceRel) else r)
      decoded match {
        case None => Iterator.empty
        case Some(a) =>
          val win = (a.sampleRate.toLong * windowMs / 1000L).toInt
          if (win < 1) Iterator.empty
          else a.samples.grouped(win).filter(_.length == win).map { w =>
            val bb = java.nio.ByteBuffer.allocate(w.length * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            w.foreach { s =>
              bb.putShort(math.max(-32768L,
                math.min(32767L, math.round(s * 32768.0))).toShort)
            }
            (row.media_id, bb.array())
          }
      }
    }.toDF("media_id", "window")
      .select(col("media_id"), xxhash64(col("window")).as("fp"))
      .distinct()
  }

  /** Per-clip PERCEPTUAL audio fingerprints: (media_id, fp) DISTINCT rows
    * from [[AudioCodec.peakBandWords]] spectral-peak words (simplified
    * Wang 2003 constellations — public knowledge), shingled `shingle`
    * consecutive frames per fingerprint. The perceptual twin of
    * [[audioWindowFingerprints]]: where the exact window hash matches
    * only byte-level content identity (a gain-shifted, requantized, or
    * resampled duplicate — the COMMON duplicate in a scraped audio corpus
    * — defeats it entirely), peak-rank words are exactly gain-invariant,
    * tower over quantization noise, and the absolute-Hz bands survive
    * resampling, so those twins overlap in fingerprint space while
    * distinct content does not.
    *
    * Shingling (k consecutive frame words folded into one 64-bit FNV-1a
    * value) is what makes SET overlap meaningful: one frame's word has
    * only bands² states — dense cross-clip collisions — while a k-frame
    * shingle has bands^(2k) effective states, and one noise-swapped
    * runner-up band costs at most k shingles of the set rather than the
    * match. Default framing is start-aligned non-overlapping like the
    * exact geometry, so a mid-frame trim shifts alignment; `hopMs` <
    * frameMs overlaps frames and bounds any trim's residual misalignment
    * at hop/2 (a hop-multiple trim just drops leading frames, which a
    * set consumer barely notices) — the standard overlap trade, paid in
    * frameMs/hopMs × more FFTs and set elements.
    *
    * Scale shape: decode + FFT + shingle run partition-local inside one
    * flatMap; only (id, long) rows reach the distinct exchange — PCM
    * bytes never shuffle. Rows no JVM codec decodes are dropped (the
    * shared media-kernel policy); GEOMETRY violations — a sample rate
    * under the 300 Hz band floor, bad frame/hop/bands config — propagate
    * loudly instead (a misconfigured corpus must not build an empty
    * index that matches nothing).
    */
  def audioSpectralFingerprints(
      media: Dataset[MediaRow],
      frameMs: Long = 125L,
      bands: Int = 32,
      shingle: Int = 4,
      hopMs: Long = 0L,
      trimSilenceRel: Double = 0.0): DataFrame = {
    import media.sparkSession.implicits._
    require(frameMs >= 1, s"frameMs must be >= 1, got $frameMs")
    require(shingle >= 1, s"shingle must be >= 1, got $shingle")
    media.filter(_.kind == "audio").flatMap { row =>
      val decoded =
        if (!AudioCodec.canDecode(row.bytes)) None
        else scala.util.Try(AudioCodec.decode(row.bytes)).toOption
          .map(r => if (trimSilenceRel > 0)
            AudioCodec.trimSilence(r, trimSilenceRel) else r)
      decoded match {
        case None => Iterator.empty
        case Some(a) =>
          // geometry violations fail FAST (the convention everywhere
          // else): only undecodable bytes drop silently. Wrapped in Try,
          // a corpus of e.g. sub-667 Hz clips (under the 300 Hz band
          // floor) would silently build an EMPTY index that matches
          // nothing; propagating the require names the offending knob.
          val words = AudioCodec.peakBandWords(a, frameMs, bands, hopMs)
          if (words.length < shingle) Iterator.empty
          else (0 to words.length - shingle).iterator.map { i =>
            // 64-bit FNV-1a over the shingle's words (deterministic,
            // partition-local; collisions at 2^-64 per pair)
            var h = 0xcbf29ce484222325L
            var j = 0
            while (j < shingle) {
              h ^= words(i + j).toLong & 0xffffffffL
              h *= 0x100000001b3L
              j += 1
            }
            (row.media_id, h)
          }
      }
    }.toDF("media_id", "fp").distinct()
  }

  /** (media_id, fp) TIME-DELTA LANDMARK fingerprint sets —
    * [[graft.multimodal.AudioCodec.landmarkWords]] per decodable audio
    * row: the tempo-robust third geometry next to the exact window hash
    * (content identity) and the frame-word shingles (gain/requantize/
    * resample robustness, but start-aligned — a small TEMPO edit
    * desynchronizes them cumulatively). Landmarks hash peak-event
    * triples with log2-binned inter-event gaps, so a ±few-% stretch
    * moves almost no element of the set.
    *
    * Same scale shape and policies as [[audioSpectralFingerprints]]:
    * decode + FFT + landmark extraction partition-local, only (id, long)
    * rows shuffle; undecodable rows drop, geometry violations propagate.
    */
  def audioLandmarkFingerprints(
      media: Dataset[MediaRow],
      frameMs: Long = 125L,
      bands: Int = 32,
      hopMs: Long = 0L,
      trimSilenceRel: Double = 0.0): DataFrame = {
    import media.sparkSession.implicits._
    require(frameMs >= 1, s"frameMs must be >= 1, got $frameMs")
    media.filter(_.kind == "audio").flatMap { row =>
      val decoded =
        if (!AudioCodec.canDecode(row.bytes)) None
        else scala.util.Try(AudioCodec.decode(row.bytes)).toOption
          .map(r => if (trimSilenceRel > 0)
            AudioCodec.trimSilence(r, trimSilenceRel) else r)
      decoded match {
        case None => Iterator.empty
        case Some(a) =>
          AudioCodec.landmarkWords(a, frameMs, bands, hopMs)
            .iterator.map(h => (row.media_id, h))
      }
    }.toDF("media_id", "fp").distinct()
  }

  /** Two-table video near-dup: which BATCH videos overlap an existing
    * CORPUS video (the incremental-feed question — batch vs standing
    * corpus, never corpus x corpus). Both sides are (id, fp) fingerprint
    * tables from [[videoFrameFingerprints]] — the corpus side is typically
    * precomputed and persisted, so corpus bytes are never re-demuxed.
    *
    * Output: (batch_id, corpus_id, shared, size_b, size_c, jaccard) with
    * jaccard >= minJaccard.
    *
    * Scale shape — the [[graft.operators.Dedup.editDistanceAgainst]]
    * convention: the stop-frame df-cap applies to the CORPUS side only
    * and bounds CANDIDATE GENERATION alone (a corpus stop-frame present
    * in half the crawl costs its posting list, not its df x batch term).
    * Unlike [[videoNearDupPairs]] — where the drop redefines the
    * similarity universe symmetrically, the sourceOverlap stopword
    * semantics — sizes here are the TRUE full set sizes on both sides,
    * so a dropped hot fingerprint can only LOWER `shared` and therefore
    * the jaccard: the cap never invents a pair, and the reported jaccard
    * is a lower bound of the true one. An index-backed match
    * ([[VideoIndex]]) keeps exactly these semantics with persisted
    * corpus sizes.
    */
  def videoNearDupAgainst(
      batchFps: DataFrame,
      corpusFps: DataFrame,
      idCol: String = "media_id",
      fpCol: String = "fp",
      minJaccard: Double = 0.5,
      maxVideosPerFp: Int = 1000): DataFrame = {
    require(minJaccard >= 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in [0, 1], got $minJaccard")
    require(maxVideosPerFp >= 1,
      s"maxVideosPerFp must be >= 1, got $maxVideosPerFp")
    def sets(df: DataFrame) = df.select(col(idCol).cast("long").as("id"),
      col(fpCol).cast("long").as("h")).distinct()
    val b = sets(batchFps)
    val c0 = sets(corpusFps)
    val shared = b.as("b").join(dfCapped(c0, maxVideosPerFp).as("c"),
        col("b.h") === col("c.h"))
      .groupBy(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
      .agg(count(lit(1)).as("shared"))
    // full sizes on BOTH sides: the cap bounds candidates only
    jaccardFiltered(shared, "batch_id", "corpus_id", setSizes(b), setSizes(c0),
      "size_b", "size_c", minJaccard)
  }

  /** Feature table as a store-ready DataFrame (vector + meta) so multimodal
    * features flow straight into the kNN/ANN/dedup operators. Meta values use
    * the TypedMeta encoding (media_id stays an INT under typed filters).
    */
  def toVectorRows(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .select(
        col("features").as("vector"),
        graft.sources.TypedMeta.metaColumn(
          "media_id" -> col("media_id"),
          "kind" -> col("kind")).as("meta"))
}

package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{Multimodal, VideoCodec, VideoIndex}

/** Measured evidence for the video near-dup family at feed scale — the
  * [[IngestProbe]] contrast applied to media: matching a fixed batch of
  * videos against a standing corpus either RECOMPUTES corpus fingerprints
  * from the container bytes every run (demux cost O(corpus), the
  * no-index path) or scans the persisted [[VideoIndex]] fps layout
  * (8-byte fingerprint rows, probe-pruned — the corpus term that stays
  * slim as the feed grows). A twin of the HIGHEST corpus id is planted in
  * the batch; both paths must find it.
  *
  * Run: sbt "runMain graft.tools.VideoProbe [corpusVideos] [batchVideos]
  * [frameLenBytes >= 8]"
  */
object VideoProbe {
  def main(args: Array[String]): Unit = {
    val corpusVideos = args.headOption.map(_.toLong).getOrElse(50000L)
    val batchVideos = args.lift(1).map(_.toLong).getOrElse(2000L)
    val frameLen = args.lift(2).map(_.toInt).getOrElse(64)
    require(frameLen >= 8,
      s"frameLen must be >= 8 (the frame id is embedded as a long), got $frameLen")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 8 frames per video, 64 payload bytes each (~700-byte AVIs); the
    // global frame id is embedded literally in the payload so every g is
    // a DISTINCT frame (a pure (g*131 + j*7) mod 256 pattern collapses to
    // 256 content classes at feed scale — every fingerprint then exceeds
    // the df-cap and the whole corpus degenerates to stop-frames)
    def frameBytes(g: Long): Array[Byte] = {
      val arr = Array.tabulate(frameLen)(j => ((g * 131 + j * 7) % 256).toByte)
      java.nio.ByteBuffer.wrap(arr)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(g)
      arr
    }
    def video(id: Long, frameKey: Long): Multimodal.MediaRow =
      Multimodal.MediaRow(id, "video",
        VideoCodec.encodeAviMjpeg(50000L,
          (0 until 8).map(f => frameBytes(frameKey * 8 + f))),
        Multimodal.MediaMeta(0, 0, "avi", 400L))
    val corpus: Dataset[Multimodal.MediaRow] = spark.range(corpusVideos)
      .map(id => video(id, id)).localCheckpoint(true)
    val plantedId = corpusVideos - 1
    val batch: Dataset[Multimodal.MediaRow] = spark.range(batchVideos - 1)
      .map(id => video(8000000L + id, 4000000L + id))
      .union(spark.range(1).map(_ => video(9000000L, plantedId)))
      .localCheckpoint(true)
    println(f"[probe] corpus $corpusVideos%,d AVIs x 8 frames x $frameLen B, " +
      f"batch $batchVideos%,d, twin of corpus id $plantedId%,d planted")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def found(out: DataFrame): Boolean =
      out.filter(col("corpus_id") === plantedId).limit(1).count() == 1L

    // the no-index path: corpus bytes re-demuxed on EVERY match run
    val recomputed = time("recompute: demux corpus + videoNearDupAgainst") {
      found(Multimodal.videoNearDupAgainst(
        Multimodal.videoFrameFingerprints(batch, 50L),
        Multimodal.videoFrameFingerprints(corpus, 50L), minJaccard = 0.5))
    }
    println(s"[probe]   twin found: $recomputed")

    val dir = java.nio.file.Files.createTempDirectory("graft_video_probe").toString
    val idx = time("VideoIndex.build (demux corpus ONCE, persist fps+sizes)") {
      VideoIndex.build(corpus, dir, everyMs = 50L, minJaccard = 0.5)
    }
    val indexed = time("VideoIndex.dedupBatch (batch demux + slim fps scan)") {
      found(idx.dedupBatch(batch))
    }
    println(s"[probe]   twin found: $indexed")
    require(recomputed && indexed, "both paths must find the planted twin")

    // the term that decides the contest at real feed sizes: per-match
    // corpus READ VOLUME (these synthetic frames are KBs and pinned in
    // RAM; production MJPEG frames are tens of KB and live on object
    // storage, where the recompute leg pays this full volume every run)
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
    spark.stop()
  }
}

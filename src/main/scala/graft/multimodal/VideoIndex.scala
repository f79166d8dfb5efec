package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EpochIndex, EpochLog}
import Multimodal.MediaRow

/** Persisted video frame-fingerprint index — the standing-corpus state of
  * incremental VIDEO near-dup detection ([[Multimodal.videoNearDupPairs]]
  * made durable, the eighth family on the [[EpochIndex]] lifecycle; the
  * [[graft.operators.WinnowIndex]] of the multimodal surface). Video bytes
  * are demuxed and fingerprinted ONCE at append time; every later match
  * touches only (id, fp) longs and per-video set sizes.
  *
  * Layout:
  *  - `{path}/fps/epoch=N` — (id, h BIGINT): the video's DISTINCT sampled
  *    frame fingerprints ([[Multimodal.videoFrameFingerprints]] under the
  *    index's persisted geometry);
  *  - `{path}/sizes/epoch=N` — (id, n BIGINT): the video's TRUE fingerprint
  *    set size, persisted so index-backed Jaccard uses full sizes without
  *    rescanning the fps layout ([[Multimodal.videoNearDupAgainst]]'s
  *    conservative semantics: the query-time df-cap bounds candidate
  *    generation only and can never invent a pair);
  *  - `{path}/meta` — (every_ms, perceptual, min_jaccard): sampling cadence,
  *    fingerprint kind, and the match threshold are INDEX STATE — a batch
  *    fingerprinted under a different cadence or kind would silently match
  *    nothing.
  *  - `{path}/commits` — the [[EpochLog]]: atomic epoch commits, orphan
  *    slices invisible, compaction/maintenance inherited. Commit rows count
  *    VIDEOS (the sizes layout's row count), the WinnowIndex discipline.
  */
case class VideoIndex(
    spark: SparkSession,
    path: String,
    everyMs: Long,
    perceptual: Boolean,
    minJaccard: Double) extends EpochIndex {

  def fpsPath: String = layoutDir("fps")
  override protected def layoutNames: Seq[String] = Seq("fps", "sizes")

  def storedFps(): DataFrame = storedLayout("fps")
  def storedSizes(): DataFrame = storedLayout("sizes")

  /** Fingerprint a new corpus slice and append it — O(batch), the standing
    * index is never rescanned; atomic via the epoch commit. Returns VIDEOS
    * appended.
    */
  def append(media: Dataset[MediaRow]): Long = appendEpoch(writeSlice(media, _))

  private[multimodal] def writeSlice(media: Dataset[MediaRow], epoch: Long): Long =
    writeFps(fps(media).localCheckpoint(true), epoch)

  private def writeFps(fp: DataFrame, epoch: Long): Long = {
    val sizes = fp.groupBy(col("id")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    EpochIndex.writeLayoutSlice(fp, s"$fpsPath/epoch=$epoch", buckets = 0)
    EpochIndex.writeLayoutSlice(sizes, s"${layoutDir("sizes")}/epoch=$epoch",
      buckets = 0)
    sizes.count()
  }

  private def fps(media: Dataset[MediaRow]): DataFrame =
    Multimodal.videoFrameFingerprints(media, everyMs, perceptual)
      .select(col("media_id").as("id"), col("fp").as("h"))

  /** Which batch videos are near-dups of an INDEXED video: (batch_id,
    * corpus_id, shared, size_b, size_c, jaccard) with jaccard >=
    * minJaccard. Corpus bytes are never re-demuxed; corpus fingerprints
    * never recomputed.
    *
    * Scale shape — the [[graft.operators.WinnowIndex.dedupBatch]]
    * discipline: when the batch is smaller than the corpus (the ingest
    * norm) the stored layout is pruned to fingerprints the batch PROBES
    * (broadcast semi-join, bounded at [[VideoIndex.MaxBroadcastFps]]),
    * then `maxVideosPerFp` drops stop-frame posting lists (df computed on
    * the pruned postings is the TRUE df — the semi-join keeps every corpus
    * row of a probed fingerprint). Jaccard uses the PERSISTED full sizes.
    */
  def dedupBatch(
      media: Dataset[MediaRow],
      maxVideosPerFp: Int = 1000): DataFrame =
    dedupBatchFps(fps(media).localCheckpoint(true), maxVideosPerFp)

  private def dedupBatchFps(
      batchFps: DataFrame, maxVideosPerFp: Int): DataFrame = {
    require(maxVideosPerFp >= 1,
      s"maxVideosPerFp must be >= 1, got $maxVideosPerFp")
    val corpusRows = log.sizeStats()._2
    val cnt = batchFps.agg(
      countDistinct(col("id")).as("videos"),
      countDistinct(col("h")).as("fps")).head()
    val (batchVideos, batchDistinctFps) = (cnt.getLong(0), cnt.getLong(1))
    val pre =
      if (batchVideos >= corpusRows) storedFps()
      else {
        val probes = batchFps.select(col("h")).distinct()
        storedFps().join(
          if (batchDistinctFps <= VideoIndex.MaxBroadcastFps) broadcast(probes)
          else probes,
          Seq("h"), "left_semi")
      }
    val shared = batchFps.as("b")
      .join(Multimodal.dfCapped(pre, maxVideosPerFp).as("c"),
        col("b.h") === col("c.h"))
      .groupBy(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
      .agg(count(lit(1)).as("shared"))
    // batch sizes full from this pass; corpus sizes full from the
    // PERSISTED layout — the cap bounds candidates only
    Multimodal.jaccardFiltered(shared, "batch_id", "corpus_id",
      Multimodal.setSizes(batchFps), storedSizes(),
      "size_b", "size_c", minJaccard)
  }

  /** ONLINE ingest — [[graft.operators.FingerprintIndex.ingestBatch]]'s
    * accepted-walk contract for the video family: batch videos in ascending
    * id order, dropped iff near-dup (jaccard >= minJaccard) of an indexed
    * video or of a KEPT lower-id batch video; survivors appended
    * (sink-before-append via `onKept`, same at-least-once replay argument).
    */
  def ingestBatch(
      media: Dataset[MediaRow],
      maxVideosPerFp: Int = 1000,
      maxSweepEdges: Int = Dedup.SmallGraphEdgeThreshold.toInt,
      onKept: Dataset[MediaRow] => Unit = _ => ()): Dataset[MediaRow] = {
    import spark.implicits._
    // >= 2 here, unlike dedupBatch's >= 1: at 1 the within-batch sweep
    // would silently drop EVERY shared fingerprint (any batch pair has
    // _nv = 2) and exact in-batch duplicates would all be kept
    require(maxVideosPerFp >= 2,
      s"ingestBatch needs maxVideosPerFp >= 2 (within-batch pairs need " +
        s"two videos), got $maxVideosPerFp")
    // one demux+fingerprint pass feeds the corpus match AND the batch scan
    val batchFps = fps(media).localCheckpoint(true)
    val dropped = EpochIndex.sweepDropped(
      dedupBatchFps(batchFps, maxVideosPerFp),
      withinBatchPairs(batchFps, maxVideosPerFp), maxSweepEdges)
    val keptDs = EpochIndex.withoutIds(media.toDF(), col("media_id"), dropped)
      .as[MediaRow]
    onKept(keptDs)
    appendEpoch(writeFps(
      EpochIndex.withoutIds(batchFps, col("id"), dropped), _))
    keptDs
  }

  /** (id_a, id_b) batch pairs with jaccard >= minJaccard, id_a < id_b —
    * the within-batch half of the ingest sweep, over the already pinned
    * fingerprint frame. Same conservative cap semantics as the corpus
    * match: the df-drop bounds candidates, sizes are full.
    */
  private def withinBatchPairs(
      batchFps: DataFrame, maxVideosPerFp: Int): DataFrame = {
    val kept = Multimodal.dfCapped(batchFps, maxVideosPerFp)
    val sizes = Multimodal.setSizes(batchFps)
    val shared = kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    Multimodal.jaccardFiltered(shared, "id_a", "id_b", sizes, sizes,
        "size_a", "size_b", minJaccard)
      .select(col("id_a"), col("id_b"))
  }

  override protected def compactionFrames(): Seq[DataFrame] =
    Seq(storedFps(), storedSizes())

  // the commit log counts VIDEOS (writeFps' invariant); the primary layout
  // holds several fp rows per video
  override protected def compactionCommitCount(): Option[Long] =
    Some(storedSizes().count())
}

object VideoIndex {

  /** Largest distinct-fingerprint probe set shipped via an EXPLICIT
    * broadcast hint in the dedup prune — the
    * [[graft.operators.WinnowIndex]] bound (2^20 longs, ~8 MB payload).
    * Above it the semi-join prune still runs, un-hinted.
    */
  private[multimodal] val MaxBroadcastFps: Long = 1L << 20

  /** Build at `path` from an initial corpus slice; sampling cadence,
    * fingerprint kind, and threshold persist in meta (index state, never
    * load options).
    */
  def build(
      media: Dataset[MediaRow],
      path: String,
      everyMs: Long = 1000L,
      perceptual: Boolean = false,
      minJaccard: Double = 0.5): VideoIndex = {
    require(everyMs >= 1, s"everyMs must be >= 1, got $everyMs")
    require(minJaccard >= 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in [0, 1], got $minJaccard")
    val spark = media.sparkSession
    import spark.implicits._
    Seq((everyMs, perceptual, minJaccard))
      .toDF("every_ms", "perceptual", "min_jaccard")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val idx = VideoIndex(spark, path, everyMs, perceptual, minJaccard)
    val n = idx.writeSlice(media, epoch = 0L)
    EpochLog(spark, path).reset(n)
    idx
  }

  /** Load a previously built index; geometry comes from the persisted meta. */
  def load(spark: SparkSession, path: String): VideoIndex = {
    val row = spark.read.parquet(s"$path/meta")
      .select(col("every_ms"), col("perceptual"), col("min_jaccard"))
      .collect().head
    VideoIndex(spark, path, row.getLong(0), row.getBoolean(1), row.getDouble(2))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted edit-distance title index — the SHORT-STRING near-dup family
  * ([[Dedup.editDistancePairs]] made durable, the seventh index family on
  * the [[EpochIndex]] lifecycle): incremental typo/near-title dedup for
  * feeds whose identity lives in a short string (news headlines, product
  * names, question titles) where one-character edits defeat every shingle
  * recipe. Layout:
  *
  *  - `{path}/titles/epoch=N` — (id BIGINT, title STRING): the corpus
  *    titles themselves. Unlike the fingerprint families there is no
  *    derived signature to store — levenshtein needs the string, and a
  *    title IS its own ~30–200-byte fingerprint; the length prefilter
  *    recomputes from it for free at match time.
  *  - `{path}/meta` — (max_edits): the match radius is INDEX STATE (the
  *    [[FingerprintIndex]] discipline) — batches matched under a
  *    different radius would silently disagree with the standing corpus.
  *  - `{path}/commits` — the [[EpochLog]]: atomic epoch commits, orphan
  *    slices invisible, compaction/maintenance inherited.
  */
case class EditIndex(
    spark: SparkSession,
    path: String,
    maxEdits: Int) extends EpochIndex {

  def titlesPath: String = layoutDir("titles")
  override protected def layoutNames: Seq[String] = Seq("titles")

  def storedTitles(): DataFrame = storedLayout("titles")

  /** Append a new corpus slice — O(batch), the standing index is never
    * rescanned; atomic via the epoch commit. Returns docs appended.
    */
  def append(docs: DataFrame, idCol: String, textCol: String): Long =
    appendEpoch(writeSlice(docs, idCol, textCol, _))

  private[operators] def writeSlice(
      docs: DataFrame, idCol: String, textCol: String, epoch: Long): Long = {
    val slim = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("title")).localCheckpoint(true)
    val n = slim.count()
    EpochIndex.writeLayoutSlice(slim, s"$titlesPath/epoch=$epoch", buckets = 0)
    n
  }

  /** Which batch titles sit within `maxEdits` of an INDEXED title:
    * (batch_id, corpus_id, dist). Delegates the whole candidate + verify
    * discipline to [[Dedup.editDistanceAgainst]] (lossless length
    * prefilter via the range-join bucketing; `maxDocsPerBlock` caps the
    * CORPUS side only, so the batch never loses a match chance).
    */
  def dedupBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      maxDocsPerBlock: Int = 1000): DataFrame =
    Dedup.editDistanceAgainst(
      batch.select(col(idCol).cast("long").as("id"), col(textCol).as("title")),
      storedTitles(), "id", "title", maxEdits,
      maxDocsPerBlock = maxDocsPerBlock)

  /** ONLINE ingest — the accepted-walk contract shared by every index
    * family: batch docs in ascending id order, dropped iff within
    * `maxEdits` of an indexed title or a KEPT lower-id batch title;
    * survivors appended (sink-before-append via `onKept`, same
    * at-least-once replay argument as [[FingerprintIndex.ingestBatch]]).
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      maxDocsPerBlock: Int = 1000,
      maxSweepEdges: Int = Dedup.SmallGraphEdgeThreshold.toInt,
      onKept: DataFrame => Unit = _ => ()): DataFrame = {
    val slim = batch.select(col(idCol).cast("long").as("id"),
      col(textCol).as("title")).localCheckpoint(true)
    val withinBatch = Dedup.editDistancePairs(slim, "id", "title", maxEdits,
        maxDocsPerBlock = maxDocsPerBlock)
      .select(col("id_a"), col("id_b"))
    val dropped = EpochIndex.sweepDropped(
      dedupBatch(slim, "id", "title", maxDocsPerBlock),
      withinBatch, maxSweepEdges)
    val keptDf = EpochIndex.withoutIds(batch, col(idCol).cast("long"), dropped)
    onKept(keptDf)
    appendEpoch(writeSlice(
      EpochIndex.withoutIds(slim, col("id"), dropped), "id", "title", _))
    keptDf
  }

  override protected def compactionFrames(): Seq[DataFrame] =
    Seq(storedTitles())
}

object EditIndex {

  /** Build at `path` from an initial corpus slice; the match radius
    * persists in meta (index state, never a load option).
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      maxEdits: Int = 3): EditIndex = {
    require(maxEdits >= 1, s"maxEdits must be >= 1, got $maxEdits")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(maxEdits).toDF("max_edits")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val idx = EditIndex(spark, path, maxEdits)
    val n = idx.writeSlice(docs, idCol, textCol, epoch = 0L)
    EpochLog(spark, path).reset(n)
    idx
  }

  /** Load a previously built index; the radius comes from persisted meta. */
  def load(spark: SparkSession, path: String): EditIndex = {
    val row = spark.read.parquet(s"$path/meta").select(col("max_edits"))
      .collect().head
    EditIndex(spark, path, row.getInt(0))
  }
}

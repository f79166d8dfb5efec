package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash fingerprint index — the standing-corpus half of
  * incremental near-dup dedup made DURABLE. [[Dedup.nearDupAgainstMinHash]]
  * recomputes corpus shingles and banding on every call; at 100 TB the
  * corpus side dwarfs any nightly batch, so production pipelines compute
  * fingerprints ONCE at ingest and keep them next to the store (the same
  * build/append/search lifecycle as [[graft.ml.IvfIndex]] on the vector
  * side, Dolma's bloom-filter file on the text side). Layout:
  *
  *  - `{path}/docs`  — (id, shingle_hashes array<bigint>): the exact-
  *    Jaccard verify payload, 8 bytes per distinct shingle instead of the
  *    document text;
  *  - `{path}/bands` — (id, band, bucket): the LSH candidate keys;
  *  - `{path}/meta`  — (shingle_len, num_hashes, bands, seed): the hash
  *    parameters are INDEX STATE ([[graft.ml.IvfIndex]]'s metric
  *    discipline) — a batch banded under different parameters would
  *    silently match nothing, so load() restores them and callers never
  *    pass them again.
  *
  * Dedup identity is hashed twice (shingle strings -> xxhash64 for the
  * verify sets; signature bands for candidates), so verify Jaccard equals
  * the string-shingle Jaccard barring a 64-bit collision — the
  * [[Dedup.dedupParagraphs]] trade, zero at test scale.
  */
case class FingerprintIndex(
    spark: SparkSession,
    path: String,
    shingleLen: Int,
    numHashes: Int,
    bands: Int,
    seed: Long) {

  def docsPath: String = s"$path/docs"
  def bandsPath: String = s"$path/bands"

  /** Fingerprint + band a new slice of corpus and append it — O(batch)
    * like [[graft.ml.IvfIndex.append]]; the standing index is never
    * rescanned. Returns rows appended (observed inside the write pass —
    * a trailing count() would re-run arbitrary user lineage).
    */
  def append(docs: DataFrame, idCol: String, textCol: String): Long =
    writeSlice(docs, idCol, textCol, "append")

  private[operators] def writeSlice(
      docs: DataFrame, idCol: String, textCol: String, mode: String): Long = {
    // one fingerprint pass feeds both layouts: pin it (localCheckpoint,
    // not persist — blocks release with the reference, no CacheManager
    // entry leaks per call)
    val fp = FingerprintIndex.fingerprints(
      docs, idCol, textCol, shingleLen, numHashes, seed).localCheckpoint(true)
    val obs = Observation()
    fp.select(col("id"), col("shingle_hashes"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(mode).parquet(docsPath)
    FingerprintIndex.banded(fp, bands, numHashes / bands)
      .write.mode(mode).parquet(bandsPath)
    obs.get("n").asInstanceOf[Long]
  }

  /** Which batch documents near-duplicate an INDEXED document:
    * (batch_id, corpus_id, jaccard) with jaccard >= threshold — the
    * [[Dedup.nearDupAgainstMinHash]] output, but the corpus side comes
    * from the stored layouts: the candidate join reads (id, band, bucket)
    * triples and the verify gathers stored shingle-hash arrays for
    * CANDIDATE corpus docs only. Corpus text is never touched, corpus
    * fingerprints are never recomputed.
    */
  def dedupBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxBucketSize: Int = 1000): DataFrame = {
    val batchFp = FingerprintIndex.fingerprints(
      batch, idCol, textCol, shingleLen, numHashes, seed).localCheckpoint(true)
    val batchBands = FingerprintIndex.banded(batchFp, bands, numHashes / bands)
    // when the batch is smaller than the index (the normal ingest shape),
    // prune the stored bands to buckets the batch PROBES before anything
    // else: the cap window below sorts per bucket, and running it over the
    // whole standing corpus would shuffle N x bands rows per batch query.
    // The semi-join drops whole buckets only, so the per-bucket cap
    // contents — and therefore the result — are unchanged. The size test
    // is cheap: batchFp is checkpointed, and the docs-table count reads
    // parquet footers. A batch that dominates the index probes most
    // buckets, making the prune pure overhead — skip it there.
    val storedBands = spark.read.parquet(bandsPath)
    val preCap =
      if (batchFp.count() < spark.read.parquet(docsPath).count())
        storedBands.join(
          batchBands.select(col("band"), col("bucket")).distinct(),
          Seq("band", "bucket"), "left_semi")
      else storedBands
    // cap only the corpus side — a degenerate bucket is a corpus property,
    // and the batch side must never lose a doc's chance to match
    val corpusBands = Dedup.capBuckets(preCap, maxBucketSize)
    val candidates = batchBands
      .as("b").join(corpusBands.as("c"),
        col("b.band") === col("c.band") && col("b.bucket") === col("c.bucket"))
      .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
    candidates
      .join(batchFp.select(col("id").as("batch_id"),
        col("shingle_hashes").as("sh_b")), Seq("batch_id"))
      .join(spark.read.parquet(docsPath).select(col("id").as("corpus_id"),
        col("shingle_hashes").as("sh_c")), Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        Dedup.jaccard(col("sh_b"), col("sh_c")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

object FingerprintIndex {

  /** Build a fresh index from the current corpus. */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      shingleLen: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      seed: Long = 42L): FingerprintIndex = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes not divisible by bands=$bands")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((shingleLen, numHashes, bands, seed))
      .toDF("shingle_len", "num_hashes", "bands", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val idx = FingerprintIndex(spark, path, shingleLen, numHashes, bands, seed)
    idx.writeSlice(docs, idCol, textCol, "overwrite") // replaces stale layouts
    idx
  }

  /** Load a previously built index; hash parameters come from the
    * persisted meta (index state, never a load option).
    */
  def load(spark: SparkSession, path: String): FingerprintIndex = {
    val row = spark.read.parquet(s"$path/meta")
      .select(col("shingle_len"), col("num_hashes"), col("bands"), col("seed"))
      .collect().head
    FingerprintIndex(spark, path, row.getInt(0), row.getInt(1), row.getInt(2),
      row.getLong(3))
  }

  /** (id, shingle_hashes, sig) — the one pass everything derives from. */
  private def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, numHashes: Int, seed: Long): DataFrame =
    Dedup.widen(docs).select(
        col(idCol).cast("long").as("id"),
        Dedup.tokenShingles(col(textCol), shingleLen).as("_sh"))
      .select(col("id"),
        transform(col("_sh"), s => xxhash64(s)).as("shingle_hashes"),
        Dedup.minhashSignature(col("_sh"), numHashes, seed).as("sig"))

  /** (id, band, bucket) candidate keys from a fingerprint frame. */
  private def banded(fp: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        hash(slice(col("sig"), j * rows + 1, rows)).as("bucket"))
    }: _*)
    fp.select(col("id"), explode(bandStructs).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }
}

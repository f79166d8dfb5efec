package graft.operators

import graft.SparkSpec
import graft.multimodal.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HammingIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text").cache()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def triples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.as[(Long, Long, Long)].collect().toSet

  /** Exact batch x corpus Hamming pairs — the brute-force truth the index
    * must reproduce EXACTLY (pigeonhole: maxHamming < nBands is total
    * recall, and the verify is the fp pair itself).
    */
  private def bruteText(
      corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame,
      maxHamming: Int): Set[(Long, Long, Long)] = {
    def fps(df: org.apache.spark.sql.DataFrame) = df.select(
      $"doc_id".cast("long").as("id"),
      Dedup.simhash(split($"text", " "), 42L).as("fp"))
    triples(fps(batch).as("b").crossJoin(fps(corpus).as("c"))
      .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"),
        Dedup.hamming64(col("b.fp"), col("c.fp")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming))
  }

  test("indexed SimHash batch dedup equals brute-force cross Hamming exactly") {
    val corpus = docs.filter($"doc_id" < 400)
    val batch = docs.filter($"doc_id" >= 400)
    val idx = HammingIndex.buildFromText(corpus, "doc_id", "text", tmp("graft_hidx"))
    val got = triples(idx.dedupBatchText(batch, "doc_id", "text", maxHamming = 3))
    assert(got == bruteText(corpus, batch, 3))
    assert(got.nonEmpty, "testdata is known to contain cross-split near-dups")
  }

  test("append is equivalent to building on the grown corpus; kind is enforced") {
    val idx = HammingIndex.buildFromText(docs.filter($"doc_id" < 200),
      "doc_id", "text", tmp("graft_hidx_app"))
    val n = idx.appendText(docs.filter($"doc_id" >= 200 && $"doc_id" < 400),
      "doc_id", "text")
    assert(n == 200L)
    val batch = docs.filter($"doc_id" >= 400)
    assert(triples(idx.dedupBatchText(batch, "doc_id", "text", 3)) ==
      bruteText(docs.filter($"doc_id" < 400), batch, 3))
    // an index of external fingerprints must refuse the SimHash text path
    val ext = HammingIndex.build(docs.limit(5).select(
        $"doc_id".as("id"), $"doc_id".as("fp")),
      "id", "fp", tmp("graft_hidx_kind"), kind = "dhash")
    val e = intercept[IllegalArgumentException] {
      ext.appendText(docs.limit(1), "doc_id", "text")
    }
    assert(e.getMessage.contains("kind=dhash"))
  }

  test("image dHash corpus: batch of re-encoded copies dedups without re-decoding") {
    // 10 deterministic-noise PPM originals form the corpus; the batch holds
    // PNG re-encodings of the first 5 (different bytes, same pixels -> same
    // dHash) plus 3 fresh images that must not match
    def noiseImage(seed: Int): ImageCodec.RawImage = {
      val rnd = new java.util.Random(seed.toLong)
      val rgb = new Array[Byte](64 * 64 * 3)
      rnd.nextBytes(rgb)
      ImageCodec.RawImage(64, 64, rgb)
    }
    def row(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaRow(id, "image", bytes, Multimodal.MediaMeta(64, 64, "img", 0))
    val corpus = spark.createDataset((0 until 10).map(i =>
      row(i.toLong, ImageCodec.encodePpm(noiseImage(i)))))
    val batch = spark.createDataset(
      (0 until 5).map(i => row(100L + i, ImageCodec.encodePng(noiseImage(i)))) ++
        (20 until 23).map(i => row(200L + i, ImageCodec.encodePpm(noiseImage(i)))))
    val idx = HammingIndex.build(Multimodal.imageDHash(corpus), "media_id", "fp",
      tmp("graft_hidx_img"), kind = "dhash")
    val got = triples(idx.dedupBatch(Multimodal.imageDHash(batch), "media_id", "fp",
      maxHamming = 3))
    assert(got == (0 until 5).map(i => (100L + i, i.toLong, 0L)).toSet, s"got $got")
  }

  test("ingestBatch: keep-vs-ACCEPTED sweep over fingerprints, replay self-heals") {
    // corpus fp X; batch: d ~ X (hamming 1), e ~ d only (hamming 2 from d,
    // 3+ from X? craft: X=0b0000, d=0b0001, e=0b0111 -> h(X,d)=1 drop d;
    // h(d,e)=2 but d DROPPED; h(X,e)=3 <= max -> e drops against corpus.
    // Use a cleaner chain instead: a fresh, b ~ a (h1), c ~ b only (h2,
    // c vs a = h3... with max=2: a kept, b drops (kept a), c keeps (its
    // only <=2 match b was dropped; c vs a = 3 > 2)
    val corpus = Seq((1L, 1000L)).toDF("id", "fp") // unrelated region
    val idx = HammingIndex.build(corpus, "id", "fp", tmp("graft_hidx_ing"),
      nBands = 4, kind = "custom")
    val batch = Seq(
      10L -> 0L, // a fresh
      11L -> 1L, // b: hamming(a,b)=1
      12L -> 7L // c: hamming(b,c)=2, hamming(a,c)=3
    ).toDF("id", "fp")
    val kept = idx.ingestBatch(batch, "id", "fp", maxHamming = 2)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L), s"got $kept")
    assert(idx.maintenance().nDocs == 3L, "corpus + the 2 kept fps")
    // replay: every batch fp now matches its own appended copy (hamming 0)
    val replay = idx.ingestBatch(batch, "id", "fp", maxHamming = 2)
      .select($"id").as[Long].collect()
    assert(replay.isEmpty && idx.maintenance().nDocs == 3L)
    // pigeonhole guard: maxHamming >= nBands voids the total-recall claim
    val guard = intercept[IllegalArgumentException] {
      idx.ingestBatch(batch, "id", "fp", maxHamming = 4)
    }
    assert(guard.getMessage.contains("pigeonhole"), s"got: ${guard.getMessage}")
    // onKept (the sink seam) runs BEFORE the append: a sink failure must
    // leave the index unchanged (the at-least-once replay contract)
    val fresh = Seq(20L -> 3000L).toDF("id", "fp")
    intercept[RuntimeException] {
      idx.ingestBatch(fresh, "id", "fp", maxHamming = 2,
        onKept = _ => throw new RuntimeException("sink down"))
    }
    assert(idx.maintenance().nDocs == 3L,
      "a failed sink write must abort the append")
    var sawDocs = -1L
    idx.ingestBatch(fresh, "id", "fp", maxHamming = 2,
      onKept = _ => sawDocs = idx.maintenance().nDocs)
    assert(sawDocs == 3L && idx.maintenance().nDocs == 4L,
      "onKept observes the pre-append index; the append lands after")
  }

  test("image ingest: a media batch dedups online against the dHash index") {
    def noiseImage(seed: Int): ImageCodec.RawImage = {
      val rnd = new java.util.Random(seed.toLong)
      val rgb = new Array[Byte](64 * 64 * 3)
      rnd.nextBytes(rgb)
      ImageCodec.RawImage(64, 64, rgb)
    }
    def row(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaRow(id, "image", bytes, Multimodal.MediaMeta(64, 64, "img", 0))
    val corpus = spark.createDataset((0 until 6).map(i =>
      row(i.toLong, ImageCodec.encodePpm(noiseImage(i)))))
    val idx = HammingIndex.build(Multimodal.imageDHash(corpus), "media_id", "fp",
      tmp("graft_hidx_imging"), kind = "dhash")
    // batch: re-encodes of corpus images 0-1 (drop), a duplicated fresh
    // image (100 kept, 101 dropped as its within-batch copy), one fresh
    val batch = spark.createDataset(Seq(
      row(90L, ImageCodec.encodePng(noiseImage(0))),
      row(91L, ImageCodec.encodePng(noiseImage(1))),
      row(100L, ImageCodec.encodePpm(noiseImage(40))),
      row(101L, ImageCodec.encodePng(noiseImage(40))),
      row(102L, ImageCodec.encodePpm(noiseImage(41)))))
    val kept = idx.ingestBatch(Multimodal.imageDHash(batch), "media_id", "fp")
      .select($"media_id").as[Long].collect().toSet
    assert(kept == Set(100L, 102L), s"got $kept")
    assert(idx.maintenance().nDocs == 8L)
  }

  test("a failed append is invisible; compact preserves results and re-distincts bands") {
    val p = tmp("graft_hidx_maint")
    val idx = HammingIndex.buildFromText(docs.filter($"doc_id" < 100),
      "doc_id", "text", p)
    // torn append: epoch directories land, commit row does not
    idx.writeSlice(HammingIndex.simhashFps(docs.filter($"doc_id" >= 100 &&
      $"doc_id" < 200), "doc_id", "text", 42L), "id", "fp", epoch = 1L)
    assert(idx.maintenance().nDocs == 100L, "uncommitted epoch must not count")
    val batch = docs.filter($"doc_id" >= 400)
    val before100 = triples(idx.dedupBatchText(batch, "doc_id", "text", 3))
    assert(before100 == bruteText(docs.filter($"doc_id" < 100), batch, 3))
    // retried append self-heals; two more appends to provoke compaction
    (1 to 3).foreach { i =>
      idx.appendText(docs.filter($"doc_id" >= 100 * i && $"doc_id" < 100 * (i + 1)),
        "doc_id", "text")
    }
    val m = idx.maintenance(maxEpochs = 2)
    assert(m.numEpochs == 4 && m.nDocs == 400L && m.needsCompaction)
    val before = triples(idx.dedupBatchText(batch, "doc_id", "text", 3))
    idx.compact()
    assert(!idx.maintenance(maxEpochs = 2).needsCompaction)
    assert(triples(idx.dedupBatchText(batch, "doc_id", "text", 3)) == before)
    assert(idx.storedBands().groupBy("fp", "band", "bucket").count()
      .filter($"count" > 1).isEmpty, "compaction re-distincts the band layout")
  }
}

package graft.streaming

import graft.SparkSpec
import graft.sources.{StoreConfig, VectorStoreCatalog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The pre-r14 [[Streams.LastEvent]] shape (typ only, no ts_ms) — used to
  * write a synthetic OLD-SCHEMA state checkpoint for the restart spec.
  */
case class LegacyLastEvent(typ: String)

class StreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tempDir(prefix: String) = Files.createTempDirectory(prefix).toString

  test("ingestDedupStream: chopping the stream differently lands on the same index") {
    // corpus (< 400) is indexed once; batch docs (>= 400) arrive either as
    // ONE drop or as TWO id-ordered drops split at 480 — the split
    // separates the corpus's one within-batch near-dup pair (474, 498), so
    // the two-drop run must drop 498 via the INDEX (474 was appended by
    // drop 1) where the one-drop run drops it via the within-batch sweep.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" < 400)
    val splits = Seq(
      "one" -> Seq(docs.filter($"doc_id" >= 400)),
      "two" -> Seq(docs.filter($"doc_id" >= 400 && $"doc_id" < 480),
        docs.filter($"doc_id" >= 480)))
    val results = splits.map { case (name, drops) =>
      val idx = graft.operators.FingerprintIndex.build(corpus, "doc_id", "text",
        tempDir(s"graft_ingdedup_idx_$name"))
      val dropDir = tempDir(s"graft_ingdedup_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", org.apache.spark.sql.types.LongType),
          StructField("text", org.apache.spark.sql.types.StringType))))
        .parquet(dropDir)
      val q = Streams.ingestDedupStream(src, idx, "doc_id", "text",
        threshold = 0.5,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"doc_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nDocs))
    }.toMap
    val (keptOne, nOne) = results("one")
    val (keptTwo, nTwo) = results("two")
    assert(keptOne == keptTwo,
      s"chopping changed the kept set: only-one=${keptOne -- keptTwo} " +
        s"only-two=${keptTwo -- keptOne}")
    assert(nOne == nTwo && nOne == 400L + keptOne.size)
    // static-path parity: one direct ingestBatch call on a fresh index
    val staticIdx = graft.operators.FingerprintIndex.build(corpus, "doc_id",
      "text", tempDir("graft_ingdedup_static"))
    val staticKept = staticIdx.ingestBatch(docs.filter($"doc_id" >= 400),
      "doc_id", "text", threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(staticKept == keptOne)
    // and the planted pair really was decided by two different mechanisms
    assert(!keptOne.contains(498L) && keptOne.contains(474L))
  }

  test("ingestEmbeddingDedupStream: chopping-independent kept set, static parity") {
    // corpus (< 400) is indexed once; four batch vectors arrive as ONE
    // drop or TWO id-ordered drops split after id 1000. 1000 = copy of
    // fresh 450 (kept), 1001 = another copy of 450 (must drop: via the
    // within-batch sweep in the one-drop run, via the INDEX in the
    // two-drop run — 1000 was appended by drop 1), 1002 = copy of corpus
    // 0 (drops), 1003 = copy of fresh 460 (kept)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    def copy(src: Long, as: Long, scale: Float) =
      emb.filter($"vec_id" === src).select(lit(as).as("vec_id"),
        transform($"embedding", x => x * lit(scale)).as("embedding"))
    val corpus = emb.filter($"vec_id" < 400)
    val all = copy(450L, 1000L, 2.0f).unionAll(copy(450L, 1001L, 3.0f))
      .unionAll(copy(0L, 1002L, 2.0f)).unionAll(copy(460L, 1003L, 1.5f))
    val splits = Seq(
      "one" -> Seq(all),
      "two" -> Seq(copy(450L, 1000L, 2.0f),
        copy(450L, 1001L, 3.0f).unionAll(copy(0L, 1002L, 2.0f))
          .unionAll(copy(460L, 1003L, 1.5f))))
    val results = splits.map { case (name, drops) =>
      val idx = graft.operators.HyperplaneIndex.build(corpus, "vec_id",
        "embedding", tempDir(s"graft_ingemb_idx_$name"), dim = 64)
      val dropDir = tempDir(s"graft_ingemb_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("vec_id", org.apache.spark.sql.types.LongType),
          StructField("embedding", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
        .parquet(dropDir)
      val q = Streams.ingestEmbeddingDedupStream(src, idx, "vec_id",
        "embedding", threshold = 0.9,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"vec_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nDocs))
    }.toMap
    assert(results("one") == results("two"))
    assert(results("one")._1 == Set(1000L, 1003L))
    assert(results("one")._2 == 402L, "corpus + the 2 kept vectors")
    // static-path parity: one direct ingestBatch call on a fresh index
    val staticIdx = graft.operators.HyperplaneIndex.build(corpus, "vec_id",
      "embedding", tempDir("graft_ingemb_static"), dim = 64)
    val staticKept = staticIdx.ingestBatch(all, "vec_id", "embedding",
      threshold = 0.9).select($"vec_id").as[Long].collect().toSet
    assert(staticKept == Set(1000L, 1003L))
  }

  test("ingestHammingDedupStream: chopping-independent kept set, static parity") {
    // the ingestEmbeddingDedupStream scenario on pre-fingerprinted rows
    // (the image-dHash / SimHash shape): corpus fps 0..9 (pairwise far),
    // batch 1000 = exact copy of corpus 3 (drops: index), 1001 = hamming-1
    // neighbor of corpus 5 (drops: index), 1002 = fresh (kept), 1003 =
    // hamming-2 neighbor of 1002 (drops: within-batch sweep in the
    // one-drop run, INDEX in the two-drop run — 1002 was appended by drop
    // 1), 1004 = fresh (kept). All cross-group distances > 3 (verified
    // constants).
    val corpus = (0L until 10L).map(i => (i, i * 1024L)).toDF("id", "fp")
    val freshA = 15999984L
    val batchRows = Seq(
      (1000L, 3L * 1024L), (1001L, 5L * 1024L ^ 1L),
      (1002L, freshA), (1003L, freshA ^ 3L), (1004L, 0x5555550L))
    def rows(ids: Long*) =
      batchRows.filter(r => ids.contains(r._1)).toDF("id", "fp")
    val splits = Seq(
      "one" -> Seq(rows(1000L, 1001L, 1002L, 1003L, 1004L)),
      "two" -> Seq(rows(1000L, 1001L, 1002L), rows(1003L, 1004L)))
    val results = splits.map { case (name, drops) =>
      val idx = graft.operators.HammingIndex.build(corpus, "id", "fp",
        tempDir(s"graft_ingham_idx_$name"), nBands = 4, kind = "custom")
      val dropDir = tempDir(s"graft_ingham_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("id", org.apache.spark.sql.types.LongType),
          StructField("fp", org.apache.spark.sql.types.LongType))))
        .parquet(dropDir)
      val q = Streams.ingestHammingDedupStream(src, idx, "id", "fp",
        maxHamming = 3,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nDocs))
    }.toMap
    assert(results("one") == results("two"))
    assert(results("one")._1 == Set(1002L, 1004L))
    assert(results("one")._2 == 12L, "corpus + the 2 kept fingerprints")
    // static-path parity: one direct ingestBatch call on a fresh index
    val staticIdx = graft.operators.HammingIndex.build(corpus, "id", "fp",
      tempDir("graft_ingham_static"), nBands = 4, kind = "custom")
    val staticKept = staticIdx.ingestBatch(
      rows(1000L, 1001L, 1002L, 1003L, 1004L), "id", "fp", maxHamming = 3)
      .select($"id").as[Long].collect().toSet
    assert(staticKept == Set(1002L, 1004L))
  }

  test("ingestSemDedupStream: chopping-independent kept set, static parity") {
    // the ingestEmbeddingDedupStream scenario, semantic family: 1000/1001 =
    // copies of fresh 450 (1000 kept, 1001 drops — sweep in the one-drop
    // run, INDEX in the two-drop run), 1002 = corpus copy (drops),
    // 1003 = copy of fresh 460 (kept)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    def copy(src: Long, as: Long, scale: Float) =
      emb.filter($"vec_id" === src).select(lit(as).as("vec_id"),
        transform($"embedding", x => x * lit(scale)).as("embedding"))
    val corpus = emb.filter($"vec_id" < 400)
    val all = copy(450L, 1000L, 2.0f).unionAll(copy(450L, 1001L, 3.0f))
      .unionAll(copy(0L, 1002L, 2.0f)).unionAll(copy(460L, 1003L, 1.5f))
    val splits = Seq(
      "one" -> Seq(all),
      "two" -> Seq(copy(450L, 1000L, 2.0f),
        copy(450L, 1001L, 3.0f).unionAll(copy(0L, 1002L, 2.0f))
          .unionAll(copy(460L, 1003L, 1.5f))))
    val results = splits.map { case (name, drops) =>
      val idx = graft.ml.SemDedupIndex.build(corpus, "vec_id", "embedding",
        tempDir(s"graft_ingsem_idx_$name"), nClusters = 8, maxIter = 5)
      val dropDir = tempDir(s"graft_ingsem_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("vec_id", org.apache.spark.sql.types.LongType),
          StructField("embedding", ArrayType(FloatType)))))
        .parquet(dropDir)
      val q = Streams.ingestSemDedupStream(src, idx, "vec_id",
        "embedding", threshold = 0.9,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"vec_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nVectors))
    }.toMap
    assert(results("one") == results("two"))
    assert(results("one")._1 == Set(1000L, 1003L))
    assert(results("one")._2 == 402L, "corpus + the 2 kept vectors")
    // static-path parity: one direct ingestBatch call on a fresh index
    val staticIdx = graft.ml.SemDedupIndex.build(corpus, "vec_id",
      "embedding", tempDir("graft_ingsem_static"), nClusters = 8, maxIter = 5)
    val staticKept = staticIdx.ingestBatch(all, "vec_id", "embedding",
      threshold = 0.9).select($"vec_id").as[Long].collect().toSet
    assert(staticKept == Set(1000L, 1003L))
  }

  test("ingestSemDedupStream autoVacuumKeepLast: epochs fold, results unchanged") {
    // 6 one-row micro-batches of fresh embeddings: without retention the
    // index ends at 7 epoch directories (build + 6 appends); with
    // autoVacuumKeepLast = 2 each batch ends with the commit-log-only
    // cadence check (fold at 2k+1 = 5 epochs), so the directory count
    // stays bounded and the kept set / stored corpus are unchanged
    // (vacuum preserves rows by construction).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val corpus = emb.filter($"vec_id" < 400)
    val feed = (0 until 6).map(i => emb.filter($"vec_id" === 450 + i)
      .select(($"vec_id" + 2000).as("vec_id"), $"embedding"))
    def run(keep: Option[Int]): (Set[Long], Long, Int) = {
      val idx = graft.ml.SemDedupIndex.build(corpus, "vec_id", "embedding",
        tempDir(s"graft_semvac_idx_${keep.isDefined}"), nClusters = 8,
        maxIter = 5)
      val dropDir = tempDir(s"graft_semvac_${keep.isDefined}")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("vec_id", org.apache.spark.sql.types.LongType),
          StructField("embedding", ArrayType(FloatType)))))
        .parquet(dropDir)
      val q = Streams.ingestSemDedupStream(src, idx, "vec_id", "embedding",
        threshold = 0.9,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"vec_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"),
        autoVacuumKeepLast = keep)
      try feed.foreach { d =>
        d.write.mode("append").parquet(dropDir)
        q.processAllAvailable()
      } finally q.stop()
      (keptIds.toSet, idx.maintenance().nVectors, idx.committedEpochCount)
    }
    val (keptOff, nOff, epochsOff) = run(None)
    val (keptOn, nOn, epochsOn) = run(Some(2))
    assert(keptOn == keptOff && keptOn.size == 6,
      "retention must not change the kept set")
    assert(nOn == nOff && nOn == 406L)
    assert(epochsOff == 7, "un-vacuumed: build + one epoch per micro-batch")
    assert(epochsOn <= 5,
      s"autoVacuumKeepLast must bound epoch proliferation, got $epochsOn")
  }

  test("ingestWinnowStream: chopping-independent kept set, static parity") {
    // corpus doc 1 = t1; batch 1000 copies t1 (drops: index), 1001 fresh
    // (kept), 1002 copies 1001 (drops: within-batch sweep in the one-drop
    // run, INDEX in the two-drop run), 1003 fresh (kept). 12-token docs
    // guarantee >= 2 selected fingerprints, so copies always clear
    // minShared = 2.
    val t1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val tA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
    val tB = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
    val batchRows = Seq((1000L, t1), (1001L, tA), (1002L, tA), (1003L, tB))
    def rows(ids: Long*) =
      batchRows.filter(r => ids.contains(r._1)).toDF("doc_id", "text")
    val splits = Seq(
      "one" -> Seq(rows(1000L, 1001L, 1002L, 1003L)),
      "two" -> Seq(rows(1000L, 1001L), rows(1002L, 1003L)))
    val results = splits.map { case (name, drops) =>
      val idx = graft.operators.WinnowIndex.build(
        Seq((1L, t1)).toDF("doc_id", "text"), "doc_id", "text",
        tempDir(s"graft_ingwin_idx_$name"))
      val dropDir = tempDir(s"graft_ingwin_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", org.apache.spark.sql.types.LongType),
          StructField("text", org.apache.spark.sql.types.StringType))))
        .parquet(dropDir)
      val q = Streams.ingestWinnowStream(src, idx, "doc_id", "text",
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"doc_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nDocs))
    }.toMap
    assert(results("one") == results("two"))
    assert(results("one")._1 == Set(1001L, 1003L))
    assert(results("one")._2 == 3L, "corpus doc + the 2 kept docs")
    // static-path parity: one direct ingestBatch on a fresh index
    val staticIdx = graft.operators.WinnowIndex.build(
      Seq((1L, t1)).toDF("doc_id", "text"), "doc_id", "text",
      tempDir("graft_ingwin_static"))
    val staticKept = staticIdx.ingestBatch(
      rows(1000L, 1001L, 1002L, 1003L), "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(staticKept == Set(1001L, 1003L))
  }

  test("ingestEditStream: chopping-independent kept set, static parity") {
    // corpus title 1 = t1; batch 1000 is a 1-edit typo of t1 (drops:
    // index), 1001 fresh (kept), 1002 a 1-edit typo of 1001 (drops:
    // within-batch sweep in the one-drop run, INDEX in the two-drop run),
    // 1003 fresh (kept)
    val t1 = "the quick brown fox jumps"
    val batchRows = Seq(
      (1000L, "the quick brown fox jumpz"),
      (1001L, "an entirely fresh headline"),
      (1002L, "an entirely fresh headlin"),
      (1003L, "something else altogether"))
    def rows(ids: Long*) =
      batchRows.filter(r => ids.contains(r._1)).toDF("doc_id", "title")
    val splits = Seq(
      "one" -> Seq(rows(1000L, 1001L, 1002L, 1003L)),
      "two" -> Seq(rows(1000L, 1001L), rows(1002L, 1003L)))
    val results = splits.map { case (name, drops) =>
      val idx = graft.operators.EditIndex.build(
        Seq((1L, t1)).toDF("doc_id", "title"), "doc_id", "title",
        tempDir(s"graft_ingedit_idx_$name"), maxEdits = 2)
      val dropDir = tempDir(s"graft_ingedit_$name")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", org.apache.spark.sql.types.LongType),
          StructField("title", org.apache.spark.sql.types.StringType))))
        .parquet(dropDir)
      val q = Streams.ingestEditStream(src, idx, "doc_id", "title",
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"doc_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"))
      try {
        drops.foreach { d =>
          d.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      name -> ((keptIds.toSet, idx.maintenance().nDocs))
    }.toMap
    assert(results("one") == results("two"))
    assert(results("one")._1 == Set(1001L, 1003L))
    assert(results("one")._2 == 3L, "corpus title + the 2 kept titles")
  }

  test("ingestParagraphDedupStream cleans drops against the growing segment index") {
    val corpus = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val idx = graft.operators.SegmentIndex.build(corpus, "doc_id", "text",
      tempDir("graft_parastream_idx"), delimiter = " ")
    val dropDir = tempDir("graft_parastream")
    val out = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", org.apache.spark.sql.types.StringType))))
      .parquet(dropDir)
    val q = Streams.ingestParagraphDedupStream(src, idx, "doc_id", "text",
      onBatch = (cleaned, _) => cleaned.as[(Long, String, Long)].collect()
        .foreach(r => out(r._1) = (r._2, r._3)),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "50 milliseconds"))
    try {
      Seq((10L, "gamma beta delta")).toDF("doc_id", "text")
        .write.mode("append").parquet(dropDir)
      q.processAllAvailable()
      Seq((20L, "delta epsilon")).toDF("doc_id", "text")
        .write.mode("append").parquet(dropDir)
      q.processAllAvailable()
    } finally q.stop()
    assert(out(10L) == (("gamma delta"), 1L), "beta was corpus state")
    assert(out(20L) == (("epsilon"), 1L),
      "delta survived micro-batch 1 and must be corpus state for batch 2")
    assert(idx.maintenance().numEpochs == 3)
  }

  test("eventRollup over the events parquet matches batch aggregation") {
    val dropDir = tempDir("graft_events_drop")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dropDir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val rollup = Streams.eventRollup(Streams.eventStream(spark, dropDir))
    val q = rollup.writeStream.outputMode("complete")
      .format("memory").queryName("rollup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rollup_out")
        .agg(sum($"n"), count(lit(1))).head()

      val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      assert(got.getLong(0) == batch.count(), "windowed n must cover every event")
      assert(got.getLong(1) > 0)
    } finally q.stop()
  }

  test("dedupStream keeps one row per text fingerprint across micro-batch drops") {
    val dropDir = tempDir("graft_dedup_drop")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    // two drops carrying the same 60 docs: every text arrives at least twice
    docs.write.mode("append").parquet(dropDir)
    docs.write.mode("append").parquet(dropDir)

    val deduped = Streams.dedupStream(Streams.documentStream(spark, dropDir))
    val q = deduped.select($"fp").writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").count()
      val want = docs.select(md5($"text".cast("binary"))).distinct().count()
      assert(got == want, s"stream emitted $got fps, batch distinct is $want")
    } finally q.stop()
  }

  test("dedupStream within-watermark drops near-in-time duplicates with bounded state") {
    val dropDir = tempDir("graft_dedup_wm_drop")
    val base = 1700000000000L
    // 4 distinct texts, each duplicated 2s apart — well inside the watermark
    val rows = (0 until 8).map(i => (i.toLong, s"text ${i % 4}", base + i * 2000L))
    rows.toDF("doc_id", "text", "ts_ms")
      .withColumn("event_time", timestamp_millis($"ts_ms"))
      .write.mode("append").parquet(dropDir)

    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", org.apache.spark.sql.types.StringType),
        StructField("ts_ms", org.apache.spark.sql.types.LongType),
        StructField("event_time", org.apache.spark.sql.types.TimestampType))))
      .parquet(dropDir)
    val deduped = Streams.dedupStream(src,
      eventTimeCol = Some("event_time"), watermark = "10 minutes")
    val q = deduped.select($"fp").writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_wm_out").count() == 4)
    } finally q.stop()
  }

  test("streaming MinHash near-dup: pair set equals batch, arrival-order-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val batch = graft.operators.Dedup.nearDupPairsMinHash(
        docs, "doc_id", "text", shingleLen = 3, numHashes = 128, bands = 32,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "corpus should contain near-dup pairs at t=0.5")

    // two different arrival orders, each as two sequential micro-batch drops
    val splits = Seq(
      "halves" -> Seq(docs.filter($"doc_id" < 250), docs.filter($"doc_id" >= 250)),
      "parity" -> Seq(docs.filter($"doc_id" % 2 === 1), docs.filter($"doc_id" % 2 === 0)))
    splits.foreach { case (name, parts) =>
      val dropDir = tempDir(s"graft_neardup_$name")
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", org.apache.spark.sql.types.LongType),
          StructField("text", org.apache.spark.sql.types.StringType))))
        .parquet(dropDir)
      val pairs = Streams.nearDupPairsMinHashStream(
        src, "doc_id", "text", shingleLen = 3, numHashes = 128, bands = 32,
        threshold = 0.5)
      val q = pairs.toDF().writeStream.outputMode("append")
        .format("memory").queryName(s"neardup_$name").start()
      try {
        parts.foreach { p =>
          p.write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
        val got = spark.table(s"neardup_$name")
          .dropDuplicates("id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got == batch,
          s"[$name] missed=${batch -- got} extra=${got -- batch}")
      } finally q.stop()
    }
  }

  test("streaming MinHash near-dup: watermarked variant emits the planted pair") {
    val dropDir = tempDir("graft_neardup_wm")
    val base = 1700000000000L
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", base),
      (2L, "the quick brown fox jumps over the lazy dog again and again", base + 1000L),
      (3L, "completely different text about spark structured streaming state", base + 2000L))
    rows.toDF("doc_id", "text", "ts_ms")
      .withColumn("event_time", timestamp_millis($"ts_ms"))
      .write.mode("append").parquet(dropDir)
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", org.apache.spark.sql.types.StringType),
        StructField("ts_ms", org.apache.spark.sql.types.LongType),
        StructField("event_time", org.apache.spark.sql.types.TimestampType))))
      .parquet(dropDir)
    val pairs = Streams.nearDupPairsMinHashStream(
      src, "doc_id", "text", threshold = 0.8,
      eventTimeCol = Some("event_time"), watermark = "10 minutes")
    val q = pairs.toDF().writeStream.outputMode("append")
      .format("memory").queryName("neardup_wm").start()
    try {
      q.processAllAvailable()
      val got = spark.table("neardup_wm")
        .dropDuplicates("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("sessionize closes sessions on gap and totals match input") {
    val dropDir = tempDir("graft_sess_drop")
    // craft a tiny deterministic stream: user 1 has two sessions (gap 10min),
    // user 2 one session
    val base = 1700000000000L
    val rows = Seq(
      (1L, base, 1.0), (1L, base + 60000, 2.0),            // session A
      (1L, base + 20 * 60000, 4.0),                        // session B (after 19min gap)
      (2L, base, 10.0), (2L, base + 30000, 20.0))
    rows.map { case (u, t, v) => (u, t * 1000000L, u, "e", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dropDir)

    val events = Streams.eventStream(spark, dropDir)
      .select($"user_id", $"event_time", $"value").as[Streams.SessionEvent]
    val sessions = Streams.sessionize(events, gapMillis = 10 * 60000, watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sess_out").collect()
      // only sessions closed by a LATER event within the same run are emitted
      // (user 1's session A closes when session B's event arrives)
      val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length == 1, s"expected user 1's first session closed, got ${out.mkString(";")}")
      assert(u1.head.getAs[Long]("n_events") == 2)
      assert(u1.head.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("transitionsStream matches batch transitions across micro-batches") {
    val dropDir = tempDir("graft_trans_drop")
    val base = 1700000000000L
    // user 1's timeline spans the two drops (the stitch rides state);
    // user 2 has a same-ts tie resolved by the (ts, type) batch tiebreak
    val drop1 = Seq(
      (1L, base, "view"), (1L, base + 1000, "click"),
      // user 2 ties at base: the (ts, type) tiebreak orders click, view
      (2L, base, "view"), (2L, base, "click"))
    val drop2 = Seq(
      (1L, base + 2000, "buy"), (2L, base + 5000, "buy"))
    def write(rows: Seq[(Long, Long, String)], f: String): Unit = {
      val stage = tempDir(s"graft_trans_stage_$f")
      rows.zipWithIndex.map { case ((u, t, ty), i) =>
        (i.toLong, t * 1000000L, u, ty, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dropDir/$f"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    write(drop1, "d1.parquet")

    val events = Streams.eventStream(spark, dropDir, glob = Some("d*.parquet"))
      .select($"user_id", unix_millis($"event_time").as("ts_ms"), $"event_type")
      .as[Streams.TransitionEvent]
    val q = Streams.transitionsStream(events).toDF().writeStream
      .outputMode("append").format("memory").queryName("trans_out").start()
    try {
      q.processAllAvailable()
      write(drop2, "d2.parquet")
      q.processAllAvailable()
      val got = spark.table("trans_out")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
      val want = graft.operators.Funnel.transitions(
        (drop1 ++ drop2).toDF("user_id", "ts_ms", "event_type"),
        "user_id", "ts_ms", "event_type", bucketMs = 3600000L)
        .as[(String, String, Long)].collect().toSet
      assert(got == want, s"stream $got vs batch $want")
      // the cross-drop stitch really happened: user 1's click->buy edge
      // only exists if drop 2 chained onto drop 1's state
      assert(got.contains(("click", "buy", 1L)))
    } finally q.stop()
  }

  test("transitionsStream restart from a pre-r14 (typ-only) checkpoint: " +
    "withStateSchemaAdvice converts the engine error into the " +
    "drain-and-restart instruction") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val srcDir = tempDir("graft_trans_v1_src")
    val cp = tempDir("graft_trans_v1_cp")
    Seq((1L, 10L, "view"), (1L, 20L, "click"))
      .toDF("user_id", "ts_ms", "event_type").write.parquet(s"$srcDir/b0")
    def src = spark.readStream
      .schema("user_id long, ts_ms long, event_type string")
      .parquet(s"$srcDir/*").as[Streams.TransitionEvent]
    // the synthetic old-schema checkpoint: the SAME operator topology
    // (one NoTimeout flatMapGroupsWithState keyed by user_id) with the
    // pre-r14 single-field state class
    val q1 = src.groupByKey(_.user_id)
      .flatMapGroupsWithState[LegacyLastEvent, Streams.TransitionEdge](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[Streams.TransitionEvent],
         st: GroupState[LegacyLastEvent]) =>
          rows.toSeq.sortBy(_.ts_ms).lastOption
            .foreach(e => st.update(LegacyLastEvent(e.event_type)))
          Iterator.empty
      }.toDF().writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", cp).start()
    q1.processAllAvailable(); q1.stop()
    // restart the CURRENT operator on the same checkpoint — the engine's
    // state-schema check refuses; the wrapper must name the remedy
    Seq((1L, 30L, "buy")).toDF("user_id", "ts_ms", "event_type")
      .write.mode("append").parquet(s"$srcDir/b1")
    val e = intercept[IllegalStateException] {
      Streams.withStateSchemaAdvice("transitionsStream") {
        val q2 = Streams.transitionsStream(src).toDF().writeStream
          .outputMode("append").format("noop")
          .option("checkpointLocation", cp).start()
        try q2.processAllAvailable()
        finally { scala.util.Try(q2.stop()); () }
      }
    }
    assert(e.getMessage.contains("transitionsStream") &&
      e.getMessage.contains("FRESH checkpoint directory"),
      s"instruction must name operator + remedy, got: ${e.getMessage}")
    assert(Streams.stateSchemaAdvice(e.getCause).isDefined,
      "the cause chain carries the engine's schema incompatibility")
    // non-schema failures pass through the detector untouched
    assert(Streams.stateSchemaAdvice(new RuntimeException("boom")).isEmpty)
  }

  test("transitionsStream idleTimeoutMs expires state in event time; " +
      "returning user starts a fresh chain (batch bucket-boundary parity)") {
    val dropDir = tempDir("graft_trans_to_drop")
    val base = 1700000000000L
    def write(rows: Seq[(Long, Long, String)], f: String): Unit = {
      val stage = tempDir(s"graft_trans_to_stage_$f")
      rows.zipWithIndex.map { case ((u, t, ty), i) =>
        (i.toLong, t * 1000000L, u, ty, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(s"$dropDir/$f"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // drop 1: users 1 and 2 each emit a two-event chain
    write(Seq((1L, base, "view"), (1L, base + 1000, "click"),
      (2L, base, "view"), (2L, base + 1000, "add")), "d1.parquet")

    val events = Streams.eventStream(spark, dropDir, glob = Some("d*.parquet"))
      .select($"user_id", unix_millis($"event_time").as("ts_ms"), $"event_type")
      .as[Streams.TransitionEvent]
    // idle horizon 1h of EVENT time: expiry is driven by the watermark,
    // never the wall clock, so the test is deterministic
    val q = Streams.transitionsStream(events, idleTimeoutMs = Some(3600000L))
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("trans_to_out").start()
    try {
      q.processAllAvailable()
      val rowsAfterD1 = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rowsAfterD1 == 2L, s"expected 2 state rows after drop 1, got $rowsAfterD1")

      // user 3's event 2h later advances the watermark past users 1+2's
      // idle deadlines: their state must actually be removed
      write(Seq((3L, base + 7200000, "view")), "d2.parquet")
      q.processAllAvailable()
      val rowsAfterD2 = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rowsAfterD2 == 1L,
        s"expected users 1+2 expired leaving only user 3, got $rowsAfterD2 state rows")

      // user 1 returns AFTER expiry: fresh chain, so no click->buy edge;
      // user 4's two events land in the SAME drop with a 2h internal gap —
      // the gap CHECK must split them even though no timeout fired between
      // (chop-independence of the armed semantics)
      write(Seq((1L, base + 7203000, "buy"),
        (4L, base + 7200000, "open"), (4L, base + 14400000, "close")),
        "d3.parquet")
      q.processAllAvailable()
      val got = spark.table("trans_to_out")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect().toSet
      assert(!got.exists(e => e._2 == "buy"),
        s"expired user must not chain across the timeout, got $got")
      assert(!got.contains(("open", "close", 1L)),
        s"a within-batch gap beyond the horizon must split the chain, got $got")
      // parity: the armed stream equals the batch operator applied PER
      // idle-gap session — sessions encoded as synthetic user keys (101 =
      // user 1's second session, 104 = user 4's second)
      val want = graft.operators.Funnel.transitions(
        Seq((1L, base, "view"), (1L, base + 1000, "click"),
          (2L, base, "view"), (2L, base + 1000, "add"),
          (3L, base + 7200000, "view"), (101L, base + 7203000, "buy"),
          (4L, base + 7200000, "open"), (104L, base + 14400000, "close"))
          .toDF("user_id", "ts_ms", "event_type"),
        "user_id", "ts_ms", "event_type", bucketMs = 3600000L)
        .as[(String, String, Long)].collect().toSet
      assert(got == want && got == Set(("view", "click", 1L), ("view", "add", 1L)),
        s"stream $got vs batch-per-session $want")
    } finally q.stop()
  }

  test("heavyHittersStream: sharded MG summaries + exact pass 2 equal batch " +
      "under any chopping") {
    // 800 singleton tails + three heavy items; minFrac 0.05 over n=1010:
    // hotA(120) and hotB(90) pass (>50.5), hotC(50) teeters below
    val items = (1 to 800).map(i => s"tail$i") ++
      Seq.fill(120)("hotA") ++ Seq.fill(90)("hotB") ++ Seq.fill(50)("hotC")
    val shuffled = new scala.util.Random(3).shuffle(items)
    val minFrac = 0.05
    val k = math.ceil(1.0 / minFrac).toInt
    val batch = graft.operators.HeavyHitters.heavyHitters(
      shuffled.toDF("item"), col("item"), minFrac)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch == Map("hotA" -> 120L, "hotB" -> 90L))

    for ((chops, tag) <- Seq(Seq(1010) -> "one", Seq(300, 300, 300, 110) -> "four")) {
      val dropDir = tempDir(s"graft_hh_drop_$tag")
      var off = 0
      def write(nRows: Int, f: String): Unit = {
        val stage = tempDir(s"graft_hh_stage_$tag$off")
        shuffled.slice(off, off + nRows).toDF("item")
          .coalesce(1).write.mode("overwrite").parquet(stage)
        off += nRows
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, Paths.get(s"$dropDir/$f"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      write(chops.head, "d0.parquet")
      val src = spark.readStream
        .schema(StructType(Seq(StructField("item",
          org.apache.spark.sql.types.StringType))))
        .option("pathGlobFilter", "d*.parquet").parquet(dropDir)
      val q = Streams.heavyHittersStream(src, "item", k, nShards = 5)
        .toDF().writeStream.outputMode("update")
        .format("memory").queryName(s"hh_out_$tag").start()
      try {
        q.processAllAvailable()
        chops.tail.zipWithIndex.foreach { case (c, i) =>
          write(c, s"d${i + 1}.parquet")
          q.processAllAvailable()
        }
        // latest snapshot per shard = the rows carrying its max shard_n
        val all = spark.table(s"hh_out_$tag")
          .as[Streams.HhSummary].collect().toSeq
        val latest = all.groupBy(_.shard).values.flatMap { rows =>
          val mx = rows.map(_.shard_n).max
          rows.filter(_.shard_n == mx)
        }.toSeq
        val totalN = latest.groupBy(_.shard)
          .map { case (_, rows) => rows.head.shard_n }.sum
        assert(totalN == 1010L, s"[$tag] totalN=$totalN")
        val cands = latest.map(_.hash).distinct
        assert(cands.size <= 5 * 2 * k, s"[$tag] candidate set is bounded")
        val exact = graft.operators.HeavyHitters.exactFromCandidates(
          shuffled.toDF("item"), col("item"), minFrac, cands, totalN)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(exact == batch, s"[$tag] stream+pass2 $exact vs batch $batch")
      } finally q.stop()
    }
  }

  test("qualityGateStream: chopped drops reproduce the batch pipeline; " +
      "corpus statistics are paid once at stream start") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang").localCheckpoint(true)
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val model = graft.text.NgramLm.trainKn(
      docs.filter($"doc_id" % 4 =!= 0), "text",
      maxVocab = 256, minBigramCount = 2)
    // batch truth: the same stages over the whole table
    val mixed = graft.operators.Curation.weightedSample(
      docs, "doc_id", "lang", rates)
    val ent = graft.text.TextAnalysis.tokenEntropy(mixed, "doc_id", "text")
      .filter($"entropy_x1e4" > 28000L)
      .select($"id".as("doc_id"), $"entropy_x1e4")
    val want = mixed.join(ent, Seq("doc_id"))
      .select($"doc_id".cast("long").as("id"), $"lang", $"entropy_x1e4",
        round(graft.text.NgramLm.perplexityKn($"text", model) * 10000)
          .cast("long").as("ppl_x1e4"))
      .filter($"ppl_x1e4" < 310000L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.nonEmpty && want.size < docs.count(),
      "both gates must actually drop something for the test to mean anything")

    val dropDir = tempDir("graft_qgate_drop")
    def write(lo: Long, hi: Long, f: String): Unit = {
      val stage = tempDir(s"graft_qgate_stage_$lo")
      docs.filter($"doc_id" >= lo && $"doc_id" < hi)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(s"$dropDir/$f"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    write(0L, 150L, "d0.parquet")
    val src = spark.readStream.schema(Streams.DocumentSchema)
      .option("pathGlobFilter", "d*.parquet").parquet(dropDir)
    val got = new java.util.concurrent.ConcurrentHashMap[
      Long, (String, Long, Long)]()
    val q = Streams.qualityGateStream(src, rates, model,
      onBatch = (report, _) => report.collect().foreach(r =>
        got.put(r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))),
      // AvailableNow would stop after drop 0; keep polling for d1/d2
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      q.processAllAvailable()
      write(150L, 400L, "d1.parquet")
      q.processAllAvailable()
      write(400L, 10000L, "d2.parquet")
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val gotSet = got.asScala.toSet.map { kv: (Long, (String, Long, Long)) =>
      (kv._1, kv._2._1, kv._2._2, kv._2._3)
    }
    assert(gotSet == want, s"stream ${gotSet.size} vs batch ${want.size}")
  }

  test("qualityGateFrames: gates byte-identically to the broadcast model, " +
      "and still gates past the broadcast cap where trainKn refuses") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang").localCheckpoint(true)
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val ref = docs.filter($"doc_id" % 4 =!= 0)
    // broadcast truth: the gate through the collected-table model
    val model = graft.text.NgramLm.trainKn(ref, "text",
      maxVocab = 256, minBigramCount = 2)
    val want = Streams.qualityGate(docs, rates, model)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.nonEmpty && want.size < docs.count(),
      "the gate must actually drop something for the test to mean anything")
    // the broadcast route REFUSES this corpus at a tiny table cap — the
    // ceiling its scaladoc documents, hit for real here...
    val refusal = intercept[IllegalArgumentException] {
      graft.text.NgramLm.trainKn(ref, "text",
        maxVocab = 256, minBigramCount = 2, maxBigrams = 4)
    }
    assert(refusal.getMessage.contains("maxBigrams"))
    // ...while the frames route has no cap to hit: the SAME corpus trains
    // (the pruned bigram table stays a DataFrame) and the gate's
    // decisions are byte-identical to the broadcast truth
    val frames = graft.text.NgramLm.trainKnDistributed(ref, "text",
      maxVocab = 256, minBigramCount = 2)
    try {
      val got = Streams.qualityGateFrames(docs, rates, frames)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want, s"frames gate ${got.size} vs broadcast ${want.size}")
    } finally frames.unpersist()
  }

  test("qualityGateKn3Frames: the TRIGRAM gate's decisions are " +
      "byte-identical across the broadcast and frames routes, and the " +
      "frames route still gates where trainKn3 refuses at the cap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang").localCheckpoint(true)
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val ref = docs.filter($"doc_id" % 4 =!= 0)
    // broadcast truth: the gate through the collected trigram table
    // (ceiling at the trigram perplexity scale — the q188 knob)
    val model = graft.text.NgramLm.trainKn3(ref, "text",
      maxVocab = 256, minTrigramCount = 2)
    val want = Streams.qualityGateKn3(docs, rates, model,
        maxPplX1e4 = 640000L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.nonEmpty && want.size < docs.count(),
      "the trigram gate must actually drop something to mean anything")
    // the PERPLEXITY ceiling must discriminate too (not just mix+entropy):
    // an unbounded ceiling keeps strictly more survivors
    val noCeiling = Streams.qualityGateKn3(docs, rates, model,
        maxPplX1e4 = Long.MaxValue)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.size < noCeiling.size,
      "the 640000 ceiling must gate some mixed+entropy survivors")
    // the broadcast route refuses this corpus at a tiny trigram cap...
    val refusal = intercept[IllegalArgumentException] {
      graft.text.NgramLm.trainKn3(ref, "text",
        maxVocab = 256, minTrigramCount = 2, maxTrigrams = 4)
    }
    assert(refusal.getMessage.contains("maxTrigrams"))
    // ...while the frames route trains the SAME corpus with no cap and
    // gates byte-identically
    val frames = graft.text.NgramLm.trainKn3Distributed(ref, "text",
      maxVocab = 256, minTrigramCount = 2)
    try {
      val got = Streams.qualityGateKn3Frames(docs, rates, frames,
          maxPplX1e4 = 640000L)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want,
        s"KN3 frames gate ${got.size} vs broadcast ${want.size}")
      // the stream form chops the same chain per micro-batch (stateless)
      val dropDir = tempDir("graft_qgate3_drop")
      val stage = tempDir("graft_qgate3_stage")
      docs.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(s"$dropDir/d0.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val src = spark.readStream.schema(Streams.DocumentSchema)
        .option("pathGlobFilter", "d*.parquet").parquet(dropDir)
      val got2 = new java.util.concurrent.ConcurrentHashMap[
        Long, (String, Long, Long)]()
      val q = Streams.qualityGateStreamKn3Frames(src, rates, frames,
        maxPplX1e4 = 640000L,
        onBatch = (report, _) => report.collect().foreach(r =>
          got2.put(r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))))
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      val gotStream = got2.asScala.toSet
        .map { kv: (Long, (String, Long, Long)) =>
          (kv._1, kv._2._1, kv._2._2, kv._2._3)
        }
      assert(gotStream == want,
        s"KN3 frames gate stream ${gotStream.size} vs batch ${want.size}")
    } finally frames.unpersist()
  }

  test("calibrateGateCeiling: exact inclusive order statistic — ties, " +
      "extremes, and gate composition") {
    def pop(xs: Long*) = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("id", "ppl_x1e4")
    // [1,1,2,3]: k=ceil(0.5*4)=2 -> ceiling 1 (the tie keeps exactly 2)
    assert(Streams.calibrateGateCeiling(pop(1, 1, 2, 3), 0.5) == 1L)
    // k=ceil(0.75*4)=3 -> ceiling 2
    assert(Streams.calibrateGateCeiling(pop(1, 1, 2, 3), 0.75) == 2L)
    // keepRate 1.0 -> the max; tiny rate floors k at 1 -> the min
    assert(Streams.calibrateGateCeiling(pop(5, 9, 7), 1.0) == 9L)
    assert(Streams.calibrateGateCeiling(pop(5, 9, 7), 0.001) == 5L)
    // ties can keep MORE than k — by the same inclusive rule every time
    assert(Streams.calibrateGateCeiling(pop(4, 4, 4, 8), 0.25) == 4L)
    intercept[IllegalArgumentException] {
      Streams.calibrateGateCeiling(pop(1), 0.0)
    }
    intercept[IllegalArgumentException] {
      Streams.calibrateGateCeiling(pop(1).filter($"id" < 0), 0.5)
    }
    // composition: score ungated, calibrate, re-gate at ceiling+1 (the
    // gates use strict <) — kept fraction >= target on real data
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang").localCheckpoint(true)
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val model = graft.text.NgramLm.trainKn(
      docs.filter($"doc_id" % 4 =!= 0), "text",
      maxVocab = 256, minBigramCount = 2)
    val scored = Streams.qualityGate(docs, rates, model,
      maxPplX1e4 = Long.MaxValue).localCheckpoint(true)
    val n = scored.count()
    val ceiling = Streams.calibrateGateCeiling(scored, 0.5)
    val regated = Streams.qualityGate(docs, rates, model,
      maxPplX1e4 = ceiling + 1)
    val kept = regated.count()
    assert(kept >= math.ceil(0.5 * n).toLong && kept < n,
      s"calibrated gate must keep >= target and < everything: $kept of $n")
  }

  test("qualityGateKn3Mod: the modified-KN gate's decisions are " +
      "byte-identical across broadcast and frames routes, and the " +
      "estimated-discount ceiling discriminates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang").localCheckpoint(true)
    val rates = graft.operators.Curation.temperatureRates(docs, "lang", 0.5)
    val ref = docs.filter($"doc_id" % 4 =!= 0)
    val model = graft.text.NgramLm.trainKn3Mod(ref, "text", maxVocab = 256)
    val want = Streams.qualityGateKn3Mod(docs, rates, model)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.nonEmpty && want.size < docs.count(),
      "the mod-KN gate must actually drop something to mean anything")
    val noCeiling = Streams.qualityGateKn3Mod(docs, rates, model,
        maxPplX1e4 = Long.MaxValue)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.size < noCeiling.size,
      "the mod-KN ceiling must gate some mixed+entropy survivors")
    val frames = graft.text.NgramLm.trainKn3ModDistributed(ref, "text",
      maxVocab = 256)
    try {
      val got = Streams.qualityGateKn3ModFrames(docs, rates, frames)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want,
        s"mod-KN frames gate ${got.size} vs broadcast ${want.size}")
    } finally frames.unpersist()
  }

  test("ingestVectors streams JSONL drops into a store with status table") {
    import org.apache.spark.sql.types._
    val dropDir = tempDir("graft_vec_drop")
    val jsonl = (0 until 20).map { i =>
      s"""{"vector": [${Seq.fill(4)(i / 20.0).mkString(",")}], "meta": {"doc": "d$i"}}"""
    }.mkString("\n")
    Files.writeString(Paths.get(s"$dropDir/drop1.jsonl"), jsonl)

    val root = tempDir("graft_stream_store")
    val catalog = new VectorStoreCatalog(spark, root)
    catalog.create("stream", "m1", StoreConfig(dimension = 4))
    val status = new Streams.BatchStatusTable(spark)
    val schema = StructType(Seq(
      StructField("vector", ArrayType(FloatType)),
      StructField("meta", MapType(StringType, StringType))))

    val q = Streams.ingestVectors(spark, dropDir, schema, catalog,
      "stream", "m1", format = "json", statusTable = Some(status))
    try q.awaitTermination(60000) finally q.stop()

    assert(catalog.count("stream", "m1") == 20)
    val st = status.toDF.collect()
    assert(st.map(_.getAs[Long]("rows_ingested")).sum == 20)
    // second drop appends incrementally
    Files.writeString(Paths.get(s"$dropDir/drop2.jsonl"),
      """{"vector": [9,9,9,9], "meta": {"doc": "late"}}""")
    val q2 = Streams.ingestVectors(spark, dropDir, schema, catalog,
      "stream", "m1", format = "json")
    try q2.awaitTermination(60000) finally q2.stop()
    // fresh checkpoint => full re-read; dedup by content happens upstream.
    assert(catalog.count("stream", "m1") >= 21)
  }

  test("ingestVectors drift gate: aligned batches land, a concentrated " +
      "batch quarantines whole — store untouched, batch inspectable") {
    import org.apache.spark.sql.types._
    val dropDir = tempDir("graft_gate_drop")
    val root = tempDir("graft_gate_store")
    val qdir = tempDir("graft_gate_quarantine")
    val cp = tempDir("graft_gate_cp")
    val catalog = new VectorStoreCatalog(spark, root)
    catalog.create("g", "m", StoreConfig(dimension = 4))
    // two clean clusters, 40 rows each, and the matching explicit
    // quantizer — assignment (and so PSI) is fully deterministic
    def clusterRow(axis: Int, i: Int): String = {
      val v = Array.fill(4)(0.001 * i); v(axis) = 1.0
      s"""{"vector": [${v.mkString(",")}], "meta": {"c": "$axis"}}"""
    }
    val base = ((0 until 40).map(clusterRow(0, _)) ++
      (0 until 40).map(clusterRow(1, _)))
    catalog.addVectors("g", "m", spark.read.schema(StructType(Seq(
        StructField("vector", ArrayType(FloatType)),
        StructField("meta", MapType(StringType, StringType)))))
      .json(base.toDS))
    catalog.buildIndexWithCentroids("g", "m",
      Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0)))
    val schema = StructType(Seq(
      StructField("vector", ArrayType(FloatType)),
      StructField("meta", MapType(StringType, StringType))))
    val status = new Streams.BatchStatusTable(spark)

    // the gate needs somewhere to put what it stops
    intercept[IllegalArgumentException] {
      Streams.ingestVectors(spark, dropDir, schema, catalog, "g", "m",
        driftMaxPsi = Some(0.25))
    }

    // drop 1: 10 rows per cluster — the store's own 50/50 mix, PSI = 0
    Files.writeString(Paths.get(s"$dropDir/aligned.jsonl"),
      ((100 until 110).map(clusterRow(0, _)) ++
        (100 until 110).map(clusterRow(1, _))).mkString("\n"))
    val q1 = Streams.ingestVectors(spark, dropDir, schema, catalog, "g", "m",
      checkpoint = Some(cp), statusTable = Some(status),
      driftMaxPsi = Some(0.25), quarantineDir = Some(qdir))
    try q1.awaitTermination(60000) finally q1.stop()
    assert(catalog.count("g", "m") == 100, "the aligned batch must land")

    // drop 2: 20 rows, ALL cluster 0 — proportion mass on one list,
    // PSI ~ 4.6 >> 0.25
    Files.writeString(Paths.get(s"$dropDir/skew.jsonl"),
      (200 until 220).map(clusterRow(0, _)).mkString("\n"))
    val q2 = Streams.ingestVectors(spark, dropDir, schema, catalog, "g", "m",
      checkpoint = Some(cp), statusTable = Some(status),
      driftMaxPsi = Some(0.25), quarantineDir = Some(qdir))
    try q2.awaitTermination(60000) finally q2.stop()
    assert(catalog.count("g", "m") == 100,
      "the drifted batch must NOT reach the store")
    val quarantined = spark.read.parquet(qdir)
    assert(quarantined.count() == 20,
      "the whole batch must be inspectable in quarantine")
    // status table: the quarantined batch records 0 ingested rows
    val st = status.toDF.collect().map(_.getAs[Long]("rows_ingested"))
    assert(st.sorted.toSeq == Seq(0L, 20L))
    // indexless stores pass everything: no quantizer, no gate
    catalog.create("g", "nogate", StoreConfig(dimension = 4))
    val q3 = Streams.ingestVectors(spark, dropDir, schema, catalog,
      "g", "nogate", driftMaxPsi = Some(0.25), quarantineDir = Some(qdir))
    try q3.awaitTermination(60000) finally q3.stop()
    assert(catalog.count("g", "nogate") == 40L,
      "both drops land on the indexless store")
  }

  test("ingestVectors autoVacuumKeepLast bounds epoch dirs; rows and " +
      "recent pins survive the folds") {
    import org.apache.spark.sql.types._
    val dropDir = tempDir("graft_vec_vac_drop")
    val root = tempDir("graft_vac_store")
    val catalog = new VectorStoreCatalog(spark, root)
    catalog.create("stream", "vac", StoreConfig(dimension = 2))
    val schema = StructType(Seq(
      StructField("vector", ArrayType(FloatType)),
      StructField("meta", MapType(StringType, StringType))))
    def drop(i: Int): Unit = Files.writeString(
      Paths.get(s"$dropDir/drop$i.jsonl"),
      (0 until 5).map(j =>
        s"""{"vector": [$i, $j], "meta": {"b": "$i"}}""").mkString("\n"))
    // one checkpointed stream across 7 drops: each drop = one micro-batch
    // = one store epoch; keepLast 2 must fold whenever pins reach 5
    val cp = tempDir("graft_vac_cp")
    (0 until 7).foreach { i =>
      drop(i)
      val q = Streams.ingestVectors(spark, dropDir, schema, catalog,
        "stream", "vac", format = "json", checkpoint = Some(cp),
        autoVacuumKeepLast = Some(2))
      try q.processAllAvailable() finally q.stop()
    }
    assert(catalog.count("stream", "vac") == 35, "no fold may lose rows")
    val eps = catalog.epochs("stream", "vac")
    assert(eps.size <= 5,
      s"epoch dirs must stay bounded by the vacuum cadence, got $eps")
    val onDisk = new java.io.File(s"$root/stream/vac/data").listFiles()
      .count(_.getName.startsWith("epoch="))
    assert(onDisk == eps.size, s"expired dirs must be reclaimed: $onDisk")
    // the newest pin is always addressable and reads the full corpus
    assert(catalog.loadAt("stream", "vac", eps.max).count() == 35)
  }

  test("stream-fed store keeps planable meta stats: append micro-batches " +
      "maintain them and the autoVacuum fold re-stamps them") {
    import org.apache.spark.sql.types._
    val dropDir = tempDir("graft_vec_stats_drop")
    val root = tempDir("graft_stats_store")
    val catalog = new VectorStoreCatalog(spark, root)
    catalog.create("stream", "st", StoreConfig(dimension = 2))
    val schema = StructType(Seq(
      StructField("vector", ArrayType(FloatType)),
      StructField("meta", MapType(StringType, StringType))))
    def drop(i: Int): Unit = Files.writeString(
      Paths.get(s"$dropDir/drop$i.jsonl"),
      (0 until 5).map(j =>
        s"""{"vector": [$i, $j], "meta": {"b": "x"}}""").mkString("\n"))
    val cp = tempDir("graft_stats_cp")
    def feed(i: Int, vacuum: Option[Int]): Unit = {
      drop(i)
      val q = Streams.ingestVectors(spark, dropDir, schema, catalog,
        "stream", "st", format = "json", checkpoint = Some(cp),
        autoVacuumKeepLast = vacuum)
      try q.processAllAvailable() finally q.stop()
    }
    feed(0, None)
    catalog.refreshMetaStats("stream", "st")
    assert(catalog.metaStatsCount("stream", "st", "b", "x").contains(5L))
    // two more micro-batch appends: maintenance keeps the stats fresh
    feed(1, None)
    feed(2, None)
    assert(catalog.metaStatsCount("stream", "st", "b", "x").contains(15L),
      "append micro-batches must maintain refreshed stats")
    // the TYPED surface reads the same stream-maintained statistics: a
    // String typed filter matches the raw stored values through the
    // legacy-bare rule, so the stored-encoding inverse serves the same
    // count (stream-fed stores never need a re-ingest for typed planning)
    assert(catalog.metaStatsCountTyped("stream", "st", "b", "x")
      .contains(15L),
      "typed lookups must read stream-maintained stats")
    // arm the vacuum lever and feed past the cadence: the fold is a
    // LAYOUT-ONLY commit — content is preserved, so the stats re-stamp
    // and the store stays planable through the entire retention cycle
    (3 until 7).foreach(i => feed(i, Some(2)))
    assert(catalog.epochs("stream", "st").size <= 5)
    assert(catalog.metaStatsCount("stream", "st", "b", "x").contains(35L),
      "a vacuum fold preserves content and must re-stamp the stats")
    // a content-CHANGING commit RE-ARMS from the kept slice (r18): the
    // deleted value reads as a fresh TRUE ZERO, not a stale gap — the
    // stream-fed store stays statistics-planned through the delete too
    catalog.deleteVectors("stream", "st",
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col("meta"), "b") === "x")
    assert(catalog.metaStatsCount("stream", "st", "b", "x").contains(0L),
      "a delete must re-arm the stats with the post-delete truth")
  }

  test("maintainIndex priority: a feed that trips compaction every batch " +
    "starves vacuum (documented trade) — results still correct") {
    // corpus of 2 docs, DOUBLING micro-batches (3, 6, 12, 24 fresh docs):
    // every batch leaves appended fraction > 0.5, so with BOTH levers
    // armed the tripped compaction wins every turn and the fold lever
    // never fires (no expire rows ever land) — the r15 verdict's watch
    // item, pinned as behavior: correctness is untouched (compaction
    // preserves rows), only the fold economics are forfeited on such a
    // feed.
    val docs = (0 until 45).map(i =>
      (1000L + i, s"fresh document number $i with unique words w${i}a w${i}b"))
    val batches = Seq((0, 3), (3, 9), (9, 21), (21, 45))
    val idx = graft.operators.FingerprintIndex.build(
      Seq((1L, "corpus seed one alpha beta"), (2L, "corpus seed two gamma delta"))
        .toDF("doc_id", "text"), "doc_id", "text", tempDir("graft_starve_idx"))
    val dropDir = tempDir("graft_starve")
    val src = spark.readStream
      .schema("doc_id long, text string").parquet(s"$dropDir/*")
    val kept = scala.collection.mutable.Set.empty[Long]
    val q = Streams.ingestDedupStream(src, idx, "doc_id", "text",
      threshold = 0.5,
      onBatch = (k, _) => kept ++= k.select($"doc_id").as[Long].collect(),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "50 milliseconds"),
      autoCompact = true, autoVacuumKeepLast = Some(1))
    try batches.zipWithIndex.foreach { case ((from, until), b) =>
      docs.slice(from, until).toDF("doc_id", "text")
        .write.mode("append").parquet(s"$dropDir/b$b")
      q.processAllAvailable()
    } finally q.stop()
    assert(kept.size == 45, "all fresh docs survive")
    val log = graft.operators.EpochLog(spark, idx.path)
    assert(log.activeFold().isEmpty,
      "vacuum never ran: every batch's tripped compaction won the turn")
    assert(log.committedEpochs().size == 1,
      "compaction kept the epoch count collapsed instead")
  }

  test("completion hook: reference retry/backoff semantics (batch_v1.py:611-657)") {
    val cfg = Streams.CompletionHookConfig(retryAttempts = 3, baseBackoffMillis = 1L)
    // succeeds on the 3rd attempt -> true, exactly 3 calls
    var calls = 0
    val flaky = (_: Map[String, String]) => { calls += 1; calls >= 3 }
    assert(Streams.notifyCompletion(cfg, Map("event" -> "x"), flaky))
    assert(calls == 3)
    // never succeeds -> false after exactly retryAttempts calls
    var failCalls = 0
    val dead = (_: Map[String, String]) => { failCalls += 1; false }
    assert(!Streams.notifyCompletion(cfg, Map("event" -> "x"), dead))
    assert(failCalls == 3)
    // a throwing transport counts as a failed attempt, not an error
    var throwCalls = 0
    val thrower = (_: Map[String, String]) => {
      throwCalls += 1
      if (throwCalls < 2) throw new RuntimeException("boom") else true
    }
    assert(Streams.notifyCompletion(cfg, Map("event" -> "x"), thrower))
    assert(throwCalls == 2)
    // exponential backoff: 3 failing attempts with base 50ms sleep 50+100ms
    val t0 = System.nanoTime()
    Streams.notifyCompletion(
      Streams.CompletionHookConfig(3, baseBackoffMillis = 50L),
      Map.empty, _ => false)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 150, s"expected >= 150ms of backoff, got $elapsedMs")
  }

  test("progress journal: ingest events tail as a live stream and a snapshot") {
    val dropDir = Files.createTempDirectory("graft_pj_drops").toString
    Files.writeString(Paths.get(s"$dropDir/drop1.jsonl"),
      (0 until 7).map(i => s"""{"vector": [1,2,3,$i]}""").mkString("\n"))
    val catalog = new graft.sources.VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_pj_store").toString)
    catalog.create("stream", "pj", graft.sources.StoreConfig(dimension = 4))
    val journal = new Streams.ProgressJournal(spark,
      Files.createTempDirectory("graft_pj_journal").toString)

    val q = Streams.ingestVectors(spark, dropDir,
      StructType(Seq(StructField("vector", ArrayType(FloatType)))), catalog,
      "stream", "pj", format = "json", progressJournal = Some(journal))
    try q.awaitTermination(60000) finally q.stop()

    // batch view: all events are durable
    val snap = journal.snapshot().collect()
    assert(snap.map(_.getAs[Long]("rows")).sum == 7)
    assert(snap.forall(_.getAs[String]("operation_id") == "ingest_stream/pj"))
    // streaming view: a late-attaching consumer replays the full history
    val name = s"pj_events_${System.nanoTime()}"
    val sq = journal.stream().writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try sq.processAllAvailable() finally sq.stop()
    assert(spark.table(name).collect().map(_.getAs[Long]("rows")).sum == 7)
  }

  test("ingest stream fires the completion hook per micro-batch") {
    val dropDir = Files.createTempDirectory("graft_hook_drops").toString
    Files.writeString(Paths.get(s"$dropDir/drop1.jsonl"),
      (0 until 5).map(i => s"""{"vector": [1,2,3,$i]}""").mkString("\n"))
    val catalog = new graft.sources.VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hook_store").toString)
    catalog.create("stream", "hook", graft.sources.StoreConfig(dimension = 4))
    val schema = StructType(Seq(
      StructField("vector", ArrayType(FloatType))))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
    val q = Streams.ingestVectors(spark, dropDir, schema, catalog,
      "stream", "hook", format = "json",
      onBatchComplete = Some(p => { seen.add(p); true }))
    try q.awaitTermination(60000) finally q.stop()
    import scala.jdk.CollectionConverters._
    val payloads = seen.asScala.toList
    assert(payloads.nonEmpty)
    assert(payloads.map(_("rows").toLong).sum == 5)
    assert(payloads.forall(p =>
      p("event") == "batch_operation_completed" && p("store") == "stream/hook"))
  }

  test("ingestDedupStream autoCompact: epochs stay bounded, results unchanged") {
    // 10 one-file drops = 10 index appends; without compaction the index
    // ends at 11 epoch directories. autoCompact evaluates the commit-log
    // verdict after every micro-batch (DefaultMaxEpochs = 8), so the
    // directory count must stay bounded while the kept set, the final doc
    // count, and a post-stream dedupBatch replay stay IDENTICAL to the
    // non-compacting run.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" < 400)
    val drops = (0 until 10).map(i =>
      docs.filter($"doc_id" >= 400 + i * 10 && $"doc_id" < 410 + i * 10))
    val probe = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)

    def run(autoCompact: Boolean): (Set[Long], Long, Int, Set[(Long, Long)]) = {
      val idx = graft.operators.FingerprintIndex.build(corpus, "doc_id",
        "text", tempDir(s"graft_autocompact_idx_$autoCompact"))
      val dropDir = tempDir(s"graft_autocompact_$autoCompact")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", org.apache.spark.sql.types.LongType),
          StructField("text", org.apache.spark.sql.types.StringType))))
        .parquet(dropDir)
      val q = Streams.ingestDedupStream(src, idx, "doc_id", "text",
        threshold = 0.5,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"doc_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"),
        autoCompact = autoCompact)
      try {
        drops.foreach { d =>
          d.coalesce(1).write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      val m = idx.maintenance()
      val replay = idx.dedupBatch(probe, "doc_id", "text", threshold = 0.5)
        .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
      (keptIds.toSet, m.nDocs, m.numEpochs, replay)
    }

    val (keptOff, nOff, epochsOff, replayOff) = run(autoCompact = false)
    val (keptOn, nOn, epochsOn, replayOn) = run(autoCompact = true)
    assert(keptOn == keptOff, "autoCompact must not change the kept set")
    assert(nOn == nOff)
    assert(replayOn == replayOff,
      "a compacted index must serve identical dedupBatch results")
    assert(epochsOff == 11, s"without compaction: build + 10 appends, got $epochsOff")
    assert(epochsOn <= graft.operators.EpochIndex.DefaultMaxEpochs + 1,
      s"autoCompact must bound epoch proliferation, got $epochsOn")
  }

  test("ingestDedupStream autoVacuumKeepLast: epoch dirs bounded at the " +
    "2k+1 cadence, kept set and replay unchanged, recent epochs untouched") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" < 400)
    val drops = (0 until 10).map(i =>
      docs.filter($"doc_id" >= 400 + i * 10 && $"doc_id" < 410 + i * 10))
    val probe = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)

    def run(keepLast: Option[Int]): (Set[Long], Long, Int, Set[(Long, Long)]) = {
      val idx = graft.operators.FingerprintIndex.build(corpus, "doc_id",
        "text", tempDir(s"graft_autovac_idx_${keepLast.isDefined}"))
      val dropDir = tempDir(s"graft_autovac_${keepLast.isDefined}")
      val keptIds = scala.collection.mutable.Set.empty[Long]
      val src = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", org.apache.spark.sql.types.LongType),
          StructField("text", org.apache.spark.sql.types.StringType))))
        .parquet(dropDir)
      val q = Streams.ingestDedupStream(src, idx, "doc_id", "text",
        threshold = 0.5,
        onBatch = (kept, _) =>
          keptIds ++= kept.select($"doc_id").as[Long].collect(),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "50 milliseconds"),
        autoVacuumKeepLast = keepLast)
      try {
        drops.foreach { d =>
          d.coalesce(1).write.mode("append").parquet(dropDir)
          q.processAllAvailable()
        }
      } finally q.stop()
      val m = idx.maintenance()
      val replay = idx.dedupBatch(probe, "doc_id", "text", threshold = 0.5)
        .select($"batch_id", $"corpus_id").as[(Long, Long)].collect().toSet
      (keptIds.toSet, m.nDocs, m.numEpochs, replay)
    }

    val (keptOff, nOff, epochsOff, replayOff) = run(None)
    val (keptOn, nOn, epochsOn, replayOn) = run(Some(2))
    assert(keptOn == keptOff, "autoVacuum must not change the kept set")
    assert(nOn == nOff, "doc-count arithmetic survives the folds")
    assert(replayOn == replayOff,
      "a vacuumed index must serve identical dedupBatch results")
    assert(epochsOff == 11, s"without retention: build + 10 appends, got $epochsOff")
    // cadence 2k+1 = 5: the fold fires whenever live epochs reach 5, so
    // the steady state oscillates in [k+1, 2k] live epochs (+ the fold)
    assert(epochsOn <= 2 * 2 + 1,
      s"autoVacuumKeepLast(2) must bound epoch dirs at the 2k+1 cadence, " +
        s"got $epochsOn")
  }

  test("decontaminateStream: chopped micro-batches reproduce the batch " +
    "operator's per-doc report; the gram set is paid once") {
    val bench = Seq((900L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docRows = Seq(
      (1L, "intro alpha beta gamma delta outro"), // 2 hit 4-grams
      (2L, "alpha beta gamma delta"), // 1 hit
      (3L, "totally clean text with no overlap at all"), // clean
      (4L, "alpha beta gamma delta alpha beta gamma delta")) // distinct grams
    def rows(ids: Long*) =
      docRows.filter(r => ids.contains(r._1)).toDF("doc_id", "text")
    val dropDir = tempDir("graft_decontam_stream")
    val out = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", org.apache.spark.sql.types.StringType))))
      .parquet(dropDir)
    val q = Streams.decontaminateStream(src, bench, "doc_id", "text",
      ngramLen = 4,
      onBatch = (report, _) => report.as[(Long, Long, Boolean)].collect()
        .foreach(r => out(r._1) = (r._2, r._3)),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "50 milliseconds"))
    try {
      Seq(rows(1L, 2L), rows(3L, 4L)).foreach { d =>
        d.write.mode("append").parquet(dropDir)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchReport = graft.operators.Curation.decontaminate(
        docRows.toDF("doc_id", "text"), bench, "doc_id", "text", ngramLen = 4)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.toMap == batchReport, s"stream $out vs batch $batchReport")
    assert(out(3L) == ((0L, false)), "clean docs keep their zero-row report")
    assert(out(1L)._2 && out(2L)._2 && out(4L)._2)
  }

  test("releaseOnTermination: release fires exactly once even when the " +
    "query terminated before the listener registered") {
    // the r14 race: registration happened AFTER start(), so a stream that
    // fails instantly could terminate before addListener landed and the
    // pinned resource leaked until JVM exit. The fix re-checks activity
    // after registering; this leg drives that path deterministically by
    // registering on a query that is ALREADY dead (strictly later than any
    // mid-start termination the race could produce).
    val dir = tempDir("graft_release_race_src")
    Seq((1L, "x")).toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", org.apache.spark.sql.types.StringType))))
      .parquet(dir)
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", tempDir("graft_release_race_cp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        throw new RuntimeException("poisoned first batch")
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(!q.isActive, "the poisoned query must be dead before registration")
    val released = new java.util.concurrent.atomic.AtomicInteger(0)
    Streams.releaseOnTermination(spark, q, () => released.incrementAndGet())
    assert(released.get == 1,
      "registration on an already-terminated query must release immediately")
    // the listener bus may still deliver the (pre-registration) termination
    // event it buffered nowhere — give the async bus a beat, then hold the
    // exactly-once line
    Thread.sleep(200)
    assert(released.get == 1, "release must never double-fire")
  }

  test("releaseOnTermination: normal termination releases exactly once " +
    "via the listener path") {
    val dir = tempDir("graft_release_norm_src")
    Seq((1L, "x")).toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", org.apache.spark.sql.types.LongType),
        StructField("text", org.apache.spark.sql.types.StringType))))
      .parquet(dir)
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", tempDir("graft_release_norm_cp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "50 milliseconds"))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val released = new java.util.concurrent.atomic.AtomicInteger(0)
    Streams.releaseOnTermination(spark, q, () => released.incrementAndGet())
    assert(released.get == 0, "an active query must not release early")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    // listener delivery is async: poll up to 5 s
    val deadline = System.nanoTime() + 5000000000L
    while (released.get == 0 && System.nanoTime() < deadline) Thread.sleep(20)
    assert(released.get == 1, "termination must release exactly once")
  }
}

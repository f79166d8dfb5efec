package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EditIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val titles = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", substring($"text", 1, 30).as("title")).cache()

  test("dedupBatch equals editDistanceAgainst over the same split") {
    val corpus = titles.filter($"doc_id" < 400)
    val batch = titles.filter($"doc_id" >= 400)
    val idx = EditIndex.build(corpus, "doc_id", "title", tmp("graft_eidx"),
      maxEdits = 10)
    val inc = idx.dedupBatch(batch, "doc_id", "title")
      .as[(Long, Long, Long)].collect().toSet
    val direct = Dedup.editDistanceAgainst(batch, corpus, "doc_id", "title",
        maxEdits = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(inc == direct)
    assert(inc.nonEmpty, "testdata is known to contain near-title pairs")
  }

  test("ingestBatch: corpus typo dropped, within-batch dup dropped, cross-batch state") {
    val idx = EditIndex.build(
      Seq((1L, "the quick brown fox")).toDF("id", "title"),
      "id", "title", tmp("graft_eidx_ing"), maxEdits = 2)
    val b1 = idx.ingestBatch(
      Seq((10L, "the quick brown fax"),   // 1 edit from corpus doc 1
        (11L, "wholly different words"),
        (12L, "wholly different wordz")   // 1 edit from kept 11
      ).toDF("id", "title"), "id", "title")
      .select($"id").as[Long].collect().sorted
    assert(b1.toSeq == Seq(11L),
      "10 is a corpus typo; 12 duplicates kept lower-id 11")
    val b2 = idx.ingestBatch(
      Seq((20L, "wholly different wordy"), // 1 edit from batch-1 survivor 11
        (21L, "an unrelated headline")
      ).toDF("id", "title"), "id", "title")
      .select($"id").as[Long].collect().sorted
    assert(b2.toSeq == Seq(21L), "20 near-dups batch-1 survivor 11")
    val storedDocs = idx.storedTitles().select($"id").as[Long].collect().sorted
    assert(storedDocs.toSeq == Seq(1L, 11L, 21L),
      "dropped titles never appended")
  }

  test("blockCol lever: matches found far beyond the cap's id horizon (r12 weak #1)") {
    // 1200 same-length corpus titles in 40 blocks => 30 titles per
    // (block, length-bucket), far under the default 1000 cap. The planted
    // one-edit twin of corpus id 1150 MUST match — under the old global
    // block + global cap, the index silently compared batches against
    // only the corpus's 1000 lowest ids, so id 1150 was unreachable.
    // Digits are TRIPLED so any two corpus titles are >= 3 edits apart:
    // the twin's single edit cannot reach anyone but its source.
    val tripled = regexp_replace(format_string("%06d", col("id")), "(.)", "$1$1$1")
    val corpus = spark.range(1200).select(
      col("id"), concat(lit("title "), tripled).as("title"),
      (col("id") % 40).cast("string").as("blk"))
    val idx = EditIndex.build(corpus, "id", "title", tmp("graft_eidx_blk"),
      maxEdits = 1, blockCol = Some("blk"))
    assert(EditIndex.load(spark, idx.path).blockCol.contains("blk"),
      "blocking column is persisted index state")
    val t1150 = "title 000000111111555000" // tripled "001150"
    val t1151 = "title 000000111111555111" // tripled "001151"
    val batch = Seq(
      (9000L, t1150.dropRight(1) + "X", "30"), // 1 edit from 1150 (1150 % 40 = 30)
      (9001L, t1151.dropRight(1) + "X", "0")   // 1 edit from 1151, WRONG block
    ).toDF("id", "title", "blk")
    val hits = idx.dedupBatch(batch, "id", "title")
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((9000L, 1150L, 1L)),
      "in-block match beyond id 1000 found; cross-block titles never pair")
    // ingest honours the same blocking: 9000 drops, 9001 survives and is
    // stored WITH its block for later batches
    val kept = idx.ingestBatch(batch, "id", "title")
      .select($"id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(9001L))
    assert(idx.storedTitles().filter($"id" === 9001L)
      .select($"block").as[String].head() == "0")
  }

  test("unblocked cap is per length bucket: long feeds keep matching past the cap") {
    // 1500 corpus titles in THREE length classes (500 each, under the
    // 1000 cap per bucket) — a twin of corpus id 1499 (the highest id,
    // length class 2) still matches with NO blockCol configured: each
    // length class keeps its own 1000 lowest ids, so the corpus no longer
    // stops matching at its 1000 oldest titles overall.
    val corpus = spark.range(1500).select(col("id"),
      concat(lit("needle "), format_string("%04d", col("id")),
        // three length classes: pad 0 / 8 / 16 chars (maxEdits=1 buckets)
        lit("x" * 16).substr(lit(1), (pmod(col("id"), lit(3)) * 8).cast("int")))
        .as("title"))
    val idx = EditIndex.build(corpus, "id", "title", tmp("graft_eidx_lb"),
      maxEdits = 1)
    // the single edit sits in the WORD, so digit neighbours stay >= 2 away
    val batch = Seq((9000L, "neXdle 1499" + "x" * 16)).toDF("id", "title")
    val hits = idx.dedupBatch(batch, "id", "title")
      .select($"corpus_id").as[Long].collect().toSet
    assert(hits == Set(1499L),
      "per-bucket cap: id 1499 (500th of its length class) is matchable")
  }

  test("legacy 2-column epochs merge deterministically with 3-column appends") {
    val path = tmp("graft_eidx_legacy")
    // hand-write a pre-blockCol index: (id, title) epoch + block_col-less meta
    Seq((1L, "the quick brown fox")).toDF("id", "title")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/titles/epoch=0")
    Seq(2).toDF("max_edits")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    EpochLog(spark, path).reset(1L)
    val idx = EditIndex.load(spark, path)
    assert(idx.blockCol.isEmpty, "legacy meta must load as unblocked")
    // a modern append writes the 3-column layout next to the legacy epoch
    idx.append(Seq((2L, "a wholly different title")).toDF("id", "title"),
      "id", "title")
    val stored = idx.storedTitles()
    assert(stored.columns.contains("block"),
      "mixed-version read must carry the block column whatever footer " +
        "parquet samples first")
    assert(stored.filter($"block".isNull).count() == 2L,
      "legacy + unblocked rows both normalize to NULL block")
    // both epochs stay reachable through the match path
    val hits = idx.dedupBatch(
      Seq((10L, "the quick brown fax"), (11L, "a wholly different titl"))
        .toDF("id", "title"), "id", "title")
      .select($"corpus_id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }

  test("load restores the radius; compaction preserves the match set") {
    val path = tmp("graft_eidx_cmp")
    val idx = EditIndex.build(
      Seq((1L, "alpha beta gamma")).toDF("id", "title"),
      "id", "title", path, maxEdits = 3)
    idx.append(Seq((2L, "delta epsilon zeta")).toDF("id", "title"),
      "id", "title")
    assert(EditIndex.load(spark, path).maxEdits == 3)
    def hits() = idx.dedupBatch(
      Seq((10L, "alpha beta gamm")).toDF("id", "title"), "id", "title")
      .select($"corpus_id").as[Long].collect().toSet
    val before = hits()
    idx.compact()
    assert(hits() == before && before == Set(1L))
    assert(idx.maintenance().nDocs == 2L)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pinned-dedupBatch (asOf) contract across the four families the
  * flagship q163 row does not cover (FingerprintIndex, WinnowIndex, and
  * the media families carry their own legs): a pin sees the corpus AS IT
  * WAS — later appends invisible — and expires loudly under compaction.
  * One build + append + pin + expire cycle per family.
  */
class AsOfIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("HammingIndex asOf: pinned banding+verify ignore later appends") {
    val idx = HammingIndex.build(
      Seq((1L, 5L)).toDF("id", "fp"), "id", "fp", tmp("graft_ham_asof"))
    idx.append(Seq((2L, 1024L)).toDF("id", "fp"), "id", "fp") // epoch 1
    idx.append(Seq((3L, 1L << 40)).toDF("id", "fp"), "id", "fp") // epoch 2
    def hits(probe: Long, asOf: Option[Long]) =
      idx.dedupBatch(Seq((100L, probe)).toDF("id", "fp"), "id", "fp",
          maxHamming = 1, asOf = asOf)
        .select($"corpus_id").as[Long].collect().toSet
    assert(hits(1L << 40, None) == Set(3L))
    assert(hits(1L << 40, Some(1L)) == Set.empty[Long],
      "doc 3 does not exist at the pin")
    assert(hits(1024L, Some(1L)) == Set(2L))
    idx.compact()
    val gone = intercept[IllegalArgumentException] {
      hits(1024L, Some(1L))
    }
    assert(gone.getMessage.contains("not in the committed history"))
  }

  test("EditIndex asOf: pinned title match ignores later appends") {
    val idx = EditIndex.build(
      Seq((1L, "alpha beta")).toDF("id", "title"), "id", "title",
      tmp("graft_edit_asof"))
    idx.append(Seq((2L, "gamma delta")).toDF("id", "title"), "id", "title")
    idx.append(Seq((3L, "epsilon zeta")).toDF("id", "title"), "id", "title")
    def hits(t: String, asOf: Option[Long]) =
      idx.dedupBatch(Seq((100L, t)).toDF("id", "title"), "id", "title",
          asOf = asOf)
        .select($"corpus_id").as[Long].collect().toSet
    assert(hits("epsilon zetas", None) == Set(3L))
    assert(hits("epsilon zetas", Some(1L)) == Set.empty[Long])
    assert(hits("gamma deltas", Some(1L)) == Set(2L))
    idx.compact()
    assert(intercept[IllegalArgumentException] {
      hits("gamma deltas", Some(1L))
    }.getMessage.contains("not in the committed history"))
  }

  test("SegmentIndex asOf: pinned membership set ignores later appends") {
    val idx = SegmentIndex.build(
      Seq((1L, "seg-a\nseg-b")).toDF("id", "text"), "id", "text",
      tmp("graft_seg_asof"))
    idx.append(Seq((2L, "seg-c")).toDF("id", "text"), "id", "text")
    idx.append(Seq((3L, "seg-d")).toDF("id", "text"), "id", "text")
    def removed(t: String, asOf: Option[Long]) =
      idx.dedupBatch(Seq((100L, t)).toDF("id", "text"), "id", "text", asOf)
        .select($"n_removed").as[Long].head()
    assert(removed("seg-d fresh", None) == 0L) // different segment text
    assert(removed("seg-d", None) == 1L)
    assert(removed("seg-d", Some(1L)) == 0L, "seg-d unknown at the pin")
    assert(removed("seg-c", Some(1L)) == 1L)
    idx.compact()
    assert(intercept[IllegalArgumentException] {
      removed("seg-c", Some(1L))
    }.getMessage.contains("not in the committed history"))
  }

  test("HyperplaneIndex asOf: pinned signature match ignores later appends") {
    def vec(seed: Int) = Seq.tabulate(8)(j =>
      math.sin(seed * 7.0 + j).toFloat)
    val idx = HyperplaneIndex.build(
      Seq((1L, vec(1))).toDF("id", "vec"), "id", "vec",
      tmp("graft_hyp_asof"), dim = 8)
    idx.append(Seq((2L, vec(2))).toDF("id", "vec"), "id", "vec")
    idx.append(Seq((3L, vec(3))).toDF("id", "vec"), "id", "vec")
    def hits(seed: Int, asOf: Option[Long]) =
      idx.dedupBatch(Seq((100L, vec(seed))).toDF("id", "vec"), "id", "vec",
          threshold = 0.99, asOf = asOf)
        .select($"corpus_id").as[Long].collect().toSet
    assert(hits(3, None) == Set(3L))
    assert(hits(3, Some(1L)) == Set.empty[Long])
    assert(hits(2, Some(1L)) == Set(2L))
    idx.compact()
    assert(intercept[IllegalArgumentException] {
      hits(2, Some(1L))
    }.getMessage.contains("not in the committed history"))
  }
}

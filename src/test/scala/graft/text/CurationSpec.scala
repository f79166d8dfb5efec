package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("flags + report account for every row exactly once") {
    val flagged = Curation.withCurationFlags(docs, "doc_id", "text",
      langs = Set("en", "und"), minQuality = 0.3, dedupThreshold = 0.5)
    assert(flagged.count() == docs.count(), "flagging must not drop rows")
    val r = Curation.report(flagged)
    assert(r.input == docs.count())
    assert(r.kept + r.droppedLang + r.droppedQuality + r.droppedDuplicate == r.input,
      s"stages must partition the corpus: $r")
    assert(r.kept > 0, "some documents must survive curation")
    val kept = Curation.curate(docs, "doc_id", "text",
      langs = Set("en", "und"), minQuality = 0.3, dedupThreshold = 0.5).count()
    assert(kept == r.kept)
  }

  test("near-duplicates collapse to one representative, lowest id wins") {
    val flagged = Curation.withCurationFlags(docs, "doc_id", "text",
      langs = Set("en", "und"), minQuality = 0.0, dedupThreshold = 0.5)
    // testdata plants near-dup pairs: at least one group loses members
    val r = Curation.report(flagged)
    assert(r.droppedDuplicate > 0, "planted near-dups must be dropped")
    // representatives are group minima
    val bad = flagged.filter(col("keep") && col("group_id") =!= col("doc_id")
      && col("group_id").isNotNull).count()
    assert(bad == 0, "kept rows must be their group's min id")
  }

  test("language gate drops what the detector rejects") {
    val mixed = Seq(
      (1L, "the cat sat on the mat and it was happy for a while today"),
      (2L, "der hund und die katze sind nicht mit dem ball zu spielen"),
      (3L, "el perro y el gato que es un animal por la casa")).toDF("doc_id", "text")
    val flagged = Curation.withCurationFlags(mixed, "doc_id", "text",
      langs = Set("en"), minQuality = 0.0, dedupThreshold = 0.9)
    val keptIds = flagged.filter(col("keep")).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L), s"only the english doc should survive, got $keptIds")
    assert(Curation.report(flagged).droppedLang == 2)
  }
}

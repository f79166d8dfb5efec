package graft.text

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composite a training-data pipeline actually runs over a raw corpus:
  * language filter -> quality filter -> near-dup dedup -> keep one
  * representative per duplicate group (the standard curation recipe, e.g.
  * C4/RefinedWeb-style, built from this engine's operators).
  *
  * Flag-then-filter design: [[withCurationFlags]] ANNOTATES every row with
  * its fate (lang, quality, dup group, keep) so the corpus is scanned once
  * and the drop accounting ([[report]]) is a plain aggregation over the
  * flags — no per-stage recount passes, and rejected rows stay inspectable
  * (the "why was my document dropped" question).
  *
  * Scale notes: language/quality are pure codegen'd column work; the only
  * wide operations are the MinHash banding join and the dedup-group labeling
  * (see Dedup's bucket caps and adaptive connected components). Quality
  * gates run BEFORE dedup so the expensive pair generation sees only
  * surviving rows.
  */
object Curation {

  case class Report(
      input: Long,
      kept: Long,
      droppedLang: Long,
      droppedQuality: Long,
      droppedDuplicate: Long)

  /** Annotate each row with curation flags; no rows are removed.
    * Added columns: lang, confidence, quality (+ quality components),
    * lang_ok, quality_ok, group_id, is_representative, keep.
    */
  def withCurationFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      dedupThreshold: Double = 0.7,
      shingleLen: Int = 3): DataFrame = {
    // pin the regex-heavy lang/quality lineage ONCE: it feeds the survivor
    // filter, the dedup-pair generation, the group labeling, and the final
    // join — unpinned, Catalyst recomputes it for each (3-4 corpus scans)
    val flagged = TextAnalysis.withQualityScore(
        TextAnalysis.withLanguageId(df, textCol), textCol)
      .withColumn("lang_ok", col("lang").isin(langs.toSeq: _*))
      .withColumn("quality_ok", col("quality") >= minQuality)
      .localCheckpoint(true)

    // dedup only among rows that survive the cheap gates
    val survivors = flagged.filter(col("lang_ok") && col("quality_ok"))
    val pairs = Dedup.nearDupPairsMinHash(
      survivors, idCol, textCol, shingleLen = shingleLen,
      threshold = dedupThreshold)
    val groups = Dedup.dedupGroups(survivors, pairs, idCol)
      .select(col("id").as("_cur_id"), col("group_id"), col("is_representative"))

    flagged
      .join(groups, col(idCol).cast("long") === col("_cur_id"), "left")
      .drop("_cur_id")
      .withColumn("keep",
        col("lang_ok") && col("quality_ok") &&
          coalesce(col("is_representative"), lit(false)))
  }

  /** Curated corpus: rows that pass every gate, one per duplicate group. */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      dedupThreshold: Double = 0.7): DataFrame =
    withCurationFlags(df, idCol, textCol, langs, minQuality, dedupThreshold)
      .filter(col("keep"))

  /** Drop accounting over a flagged corpus — ONE aggregation pass. Stages
    * attribute greedily in pipeline order: a row failing language counts as
    * droppedLang even if it would also fail quality.
    */
  def report(flagged: DataFrame): Report = {
    val r = flagged.agg(
      count(lit(1)).as("input"),
      count(when(col("keep"), 1)).as("kept"),
      count(when(!col("lang_ok"), 1)).as("d_lang"),
      count(when(col("lang_ok") && !col("quality_ok"), 1)).as("d_quality"),
      count(when(col("lang_ok") && col("quality_ok") && !col("keep"), 1))
        .as("d_dup")).head()
    Report(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }
}

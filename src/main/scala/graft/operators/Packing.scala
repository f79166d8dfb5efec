package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign every document a position in the
  * concat-and-chunk training layout (documents concatenated in a
  * deterministic order, the stream cut into fixed `contextLen` blocks) —
  * the standard GPT-style pretraining arrangement. The output is a LAYOUT
  * INDEX (doc -> shard, sequence, offset), not the materialized token
  * stream: the writer job that follows it only ever touches one shard at a
  * time.
  *
  * Scale shape: packing is inherently sequential (a doc's offset depends
  * on every doc before it), so a global layout would serialize. Real
  * pipelines shard first and pack WITHIN shards — here a deterministic
  * `id % numShards` assignment, so the layout is reproducible across runs
  * and engines (no RNG, no partition-dependent ordering). The only wide
  * operation is one running-sum window per shard; the shuffle carries
  * (id, n_tokens) pairs, never text.
  *
  * Reference analog: none (vector-only engine) — LLM-pipeline extension
  * like [[Curation]]; concat-and-chunk is the published GPT recipe.
  */
object Packing {

  /** Layout columns per document:
    *  - `shard`        — which independent packing stream the doc is in
    *  - `seq_index`    — which contextLen-sized block its FIRST token is in
    *  - `start_offset` — token offset of the doc within that block
    *  - `spans_boundary` — whether the doc crosses into the next block
    *    (the concat-and-chunk trade-off: boundary docs get split across
    *    training sequences; the flag makes the cost measurable)
    */
  def packConcatChunk(
      docs: DataFrame,
      idCol: String,
      nTokensCol: String,
      contextLen: Int,
      numShards: Int = 1024): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    // ROWS frame, not the default RANGE: RANGE merges peer rows, so two
    // docs sharing an id would each see a cumulative sum that includes the
    // OTHER's tokens — corrupting seq_index/start_offset and diverging from
    // the q54 oracle's ROWS UNBOUNDED PRECEDING. With ROWS the layout is
    // exact for unique ids and well-defined (one slot per row) otherwise.
    val w = Window.partitionBy(col("shard")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol),
        col(idCol).cast("long").as("_id"),
        col(nTokensCol).cast("long").as("_n"),
        pmod(col(idCol).cast("long"), lit(numShards.toLong)).as("shard"))
      .withColumn("_end", sum(col("_n")).over(w))
      .select(
        col(idCol), col("shard"),
        floor((col("_end") - col("_n")) / contextLen).as("seq_index"),
        ((col("_end") - col("_n")) % contextLen).as("start_offset"),
        (col("_n") > 0 &&
          floor((col("_end") - 1) / contextLen) >
            floor((col("_end") - col("_n")) / contextLen)).as("spans_boundary"))
  }

  /** [[packConcatChunk]] with the concat order made EXPLICIT: pack each
    * given shard in ascending `orderCol` — the composition a training
    * pipeline actually runs, where [[Curation.trainOrder]] first assigns
    * (shard, position) and the packer must lay tokens out in that epoch
    * order rather than by raw id (sequential-id packing would feed the
    * model the corpus in crawl order; the whole point of the manifest is
    * the reproducible mix). Same running-sum plan: one window per shard
    * over slim (id, order, n_tokens) rows — the shuffle reuses the
    * trainOrder manifest's own (shard) partitioning when composed.
    *
    * `(shardCol, orderCol)` pairs must be unique (trainOrder positions
    * are dense ranks, so they are); the ROWS frame makes the layout
    * well-defined regardless.
    */
  def packByOrder(
      docs: DataFrame,
      idCol: String,
      nTokensCol: String,
      shardCol: String,
      orderCol: String,
      contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val w = Window.partitionBy(col("shard")).orderBy(col("position"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol),
        col(shardCol).cast("long").as("shard"),
        col(orderCol).cast("long").as("position"),
        col(nTokensCol).cast("long").as("_n"))
      .withColumn("_end", sum(col("_n")).over(w))
      .select(
        col(idCol), col("shard"), col("position"),
        col("_n").as("n_tokens"),
        floor((col("_end") - col("_n")) / contextLen).as("seq_index"),
        ((col("_end") - col("_n")) % contextLen).as("start_offset"),
        (col("_n") > 0 &&
          floor((col("_end") - 1) / contextLen) >
            floor((col("_end") - col("_n")) / contextLen)).as("spans_boundary"))
  }

  /** Writer-facing manifest: for every (shard, seq_index), the docs whose
    * FIRST token lands in that block, in order — the unit of work a
    * materialization job consumes (each task renders one sequence by
    * concatenating its spans, pulling the tail of a boundary-spanning doc
    * from the previous entry). One groupBy over the layout; rows are
    * (shard, seq_index, doc span list) — no text moves.
    */
  def sequenceManifest(layout: DataFrame, idCol: String = "doc_id"): DataFrame =
    layout
      .groupBy(col("shard"), col("seq_index"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(
          col("start_offset"), col(idCol), col("spans_boundary")))).as("docs"))

  /** The writer job itself: render every packed training sequence as its
    * token run — the materialization the layout/manifest only describe.
    * Output: (shard, seq_index, seq_text, n_tokens) where `seq_text` is
    * the contextLen-token window of the shard's concatenated token stream
    * (the final sequence of a shard may run short), tokens joined by a
    * single space.
    *
    * Scale shape — SPAN-level rows, never token-level: each doc becomes
    * one row per sequence it overlaps (docs + boundary crossings rows
    * total, each carrying a token-slice of that doc), so the shuffle moves
    * every token exactly once inside slim span payloads, partitioned by
    * the (shard, seq) it belongs to. Per-sequence assembly is a sort of
    * <= n_docs-per-seq spans flattened locally. Zero-token docs occupy no
    * span and are skipped (they carry no text).
    */
  def materializeSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      contextLen: Int,
      numShards: Int = 1024): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val toks = split(col(textCol), " ")
    val w = Window.partitionBy(col("shard")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = contextLen.toLong
    val spans = docs
      .select(col(idCol).cast("long").as("_id"), toks.as("_toks"),
        pmod(col(idCol).cast("long"), lit(numShards.toLong)).as("shard"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .withColumn("_end", sum(col("_n")).over(w))
      .withColumn("_start", col("_end") - col("_n"))
      .filter(col("_n") > 0)
      .select(col("shard"), col("_toks"), col("_start"),
        explode(sequence(floor(col("_start") / L),
          floor((col("_end") - 1) / L))).as("seq_index"))
      .select(col("shard"), col("seq_index"),
        greatest(col("_start"), col("seq_index") * L).as("_span_start"),
        slice(col("_toks"),
          (greatest(col("_start"), col("seq_index") * L) - col("_start") + 1)
            .cast("int"),
          (least(col("_start") + size(col("_toks")), (col("seq_index") + 1) * L)
            - greatest(col("_start"), col("seq_index") * L)).cast("int"))
          .as("_span"))
    spans
      .groupBy(col("shard"), col("seq_index"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("_span_start"), col("_span")))),
        x => x.getField("_span"))).as("_seq_toks"))
      .select(col("shard"), col("seq_index"),
        array_join(col("_seq_toks"), " ").as("seq_text"),
        size(col("_seq_toks")).cast("long").as("n_tokens"))
  }

  /** Shard-level packing summary: sequences produced and tail waste —
    * the numbers a capacity plan needs before the writer job runs.
    */
  def packingStats(
      layout: DataFrame, docs: DataFrame, idCol: String, nTokensCol: String,
      contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    layout.join(docs.select(col(idCol), col(nTokensCol).cast("long").as("_n")), idCol)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        ceil(col("n_tokens").cast("double") / contextLen).as("n_seqs"),
        (ceil(col("n_tokens").cast("double") / contextLen) * contextLen -
          col("n_tokens")).cast("long").as("tail_waste"))
  }
}

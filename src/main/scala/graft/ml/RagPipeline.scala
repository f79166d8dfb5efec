package graft.ml

import graft.functions.HashEmbed
import graft.operators.Knn
import graft.sources.VectorStoreCatalog
import graft.text.TextAnalysis
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable text -> vector embedding (reference encode_text/encode_batch,
  * integrations/mlx_lm_pipeline.py:247-397). Model inference is out-of-engine
  * by design (SURVEY.md §2.8 F7): implementations may call an external model
  * batch-wise; the engine only sees a column transform.
  */
trait Embedder extends Serializable {
  def dimension: Int
  /** Append `outCol: array<float>` embedding of `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame
}

/** Deterministic in-engine embedder via the feature-hashing trick —
  * L2-normalized token-bucket counts. No model weights, fully reproducible,
  * runs inside whole-stage codegen; the default for tests and pipelines that
  * precompute real embeddings offline.
  */
case class HashingEmbedder(dimension: Int = 128, seed: Long = 42L) extends Embedder {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    df.withColumn(outCol,
      Bridge.column(HashEmbed(Bridge.expression(toks), dimension, seed)))
  }
}

/** RAG pipeline over a vector store (reference MLXNativeRAGPipeline,
  * integrations/mlx_lm_pipeline.py): chunk -> embed -> index; then
  * query -> embed -> kNN -> threshold + context-cap -> prompt.
  */
class RagPipeline(
    catalog: VectorStoreCatalog,
    userId: String,
    modelId: String,
    embedder: Embedder) {

  /** Chunk + embed + index documents. Chunk metadata mirrors the reference
    * (document_id, chunk_index, chunk_text, chunk_length —
    * integrations/mlx_lm_pipeline.py:667-676). Returns chunks indexed.
    */
  def indexDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 512,
      overlap: Int = 50): Long = {
    val chunks = TextAnalysis.chunks(docs, idCol, textCol, chunkSize, overlap)
    val embedded = embedder.embed(chunks, "chunk_text", "vector")
      .select(col("vector"),
        map(
          lit("document_id"), col("document_id").cast("string"),
          lit("chunk_index"), col("chunk_index").cast("string"),
          lit("chunk_text"), col("chunk_text"),
          lit("chunk_length"), col("chunk_length").cast("string")).as("meta"))
    catalog.addVectors(userId, modelId, embedded)
  }

  /** Retrieve context chunks for a query (reference retrieve_context,
    * integrations/mlx_lm_pipeline.py:725-765): over-fetch k*2, filter by
    * min similarity, greedy context-length cap, take k.
    */
  def retrieveContext(
      queryText: String,
      k: Int = 5,
      minSimilarity: Double = 0.7,
      maxContextLength: Long = 2000): DataFrame = {
    val spark = catalog.load(userId, modelId).sparkSession
    import spark.implicits._
    val qVec = embedder
      .embed(Seq(queryText).toDF("q"), "q", "vector")
      .head().getSeq[Float](1).map(_.toDouble)
    val hits = catalog.query(userId, modelId, qVec, k * 2)
      .withColumn("chunk_length",
        coalesce(col("meta")("chunk_length").cast("long"), lit(0L)))
    Knn.retrieveContext(hits, minSimilarity, maxContextLength, k)
      .select(
        col("meta")("chunk_text").as("text"),
        col("meta")("document_id").cast("long").as("document_id"),
        col("meta")("chunk_index").cast("long").as("chunk_index"),
        col("similarity_score").as("similarity"))
  }

  /** Stitch retrieved chunks into a RAG prompt (reference format_rag_prompt,
    * integrations/mlx_lm_pipeline.py:767-791 — behavioral analog).
    */
  def formatPrompt(queryText: String, context: DataFrame): String = {
    val chunks = context.select(col("text")).collect().map(_.getString(0))
    val ctx = chunks.zipWithIndex
      .map { case (c, i) => s"[${i + 1}] $c" }.mkString("\n\n")
    s"Use the following context to answer the question.\n\nContext:\n$ctx\n\nQuestion: $queryText\nAnswer:"
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bulk file ingestion (SURVEY.md §2.1 S3/S4; reference
  * api/routes/batch_v1.py:382-465).
  *
  * The reference accepts .npz and .jsonl uploads, chunked by `chunk_size`
  * (1000–50000). In Spark, chunking is the partitioner's job — every format
  * below arrives pre-parallelized; `bulkUpload` is a single validated append.
  *
  * Formats:
  *  - JSONL: one object per line, `{"vector": [...], "metadata": {...}}`
  *    (reference batch_v1.py:413-423)
  *  - CSV: a `vector` column of comma-separated floats + arbitrary metadata
  *    columns (the reference's upload regex admits csv but never shipped a
  *    parser — batch_v1.py:73; semantics defined here)
  *  - Parquet: native columns (vector: array<float>, meta: map)
  *  - NPZ: numpy zip with a `vectors` (n, d) member (reference
  *    batch_v1.py:406-410), parsed by the pure-JVM [[Npy]] reader; one Spark
  *    task per file, so a directory of upload-sized npz files ingests in
  *    parallel.
  */
object BulkLoad {

  val JsonlSchema: StructType = StructType(Seq(
    StructField("vector", ArrayType(FloatType)),
    StructField("metadata", MapType(StringType, StringType))))

  /** Read reference-shape JSONL into store-ready (vector, meta) rows. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(JsonlSchema).json(path)
      .select(col("vector"), coalesce(col("metadata"),
        typedLit(Map.empty[String, String])).as("meta"))

  /** Read CSV with a comma-separated `vector` string column; every other
    * column becomes a meta entry.
    */
  def csv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    require(raw.columns.contains("vector"), "csv bulk file needs a 'vector' column")
    val metaCols = raw.columns.filter(_ != "vector").toSeq
    val metaMap =
      if (metaCols.isEmpty) typedLit(Map.empty[String, String])
      else map(metaCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)
    raw.select(
      split(col("vector"), ",").cast(ArrayType(FloatType)).as("vector"),
      metaMap.as("meta"))
  }

  /** Read parquet with native (vector[, meta]) columns. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read npz upload files (a file or a glob/directory of them) into
    * store-ready (vector, meta) rows. Mirrors the reference's npz ingest:
    * the `vectors` member is the matrix and metadata is minted as
    * id=bulk_<row> (batch_v1.py:408-410); an optional integer `ids` member
    * (our extension) overrides the minted ids. Each file parses inside one
    * task — upload-sized files by contract, many files for scale.
    */
  def npz(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val members = Npy.parseNpz(bytes)
        val vectors = members.getOrElse("vectors",
          throw new IllegalArgumentException(
            s"npz bulk file $file has no 'vectors' member (found: ${members.keys.mkString(",")})"))
        val ids = members.get("ids").map(_.toLongVector)
        val mat = vectors.toFloatMatrix
        ids.foreach(a => require(a.length == mat.length,
          s"npz bulk file $file: ids member has ${a.length} entries for ${mat.length} vectors"))
        // minted ids are per-FILE (reference semantics); source_file keeps
        // rows from a multi-file glob distinguishable despite that
        val fileName = file.substring(file.lastIndexOf('/') + 1)
        mat.iterator.zipWithIndex.map { case (v, i) =>
          (v.toSeq, Map(
            "id" -> ids.map(a => a(i).toString).getOrElse(s"bulk_$i"),
            "source_file" -> fileName))
        }
      }
      .toDF("vector", "meta")
  }

  /** Validated chunk-free bulk append into a store. Returns rows ingested. */
  def bulkUpload(
      catalog: VectorStoreCatalog,
      userId: String,
      modelId: String,
      rows: DataFrame): Long =
    catalog.addVectors(userId, modelId, rows)
}

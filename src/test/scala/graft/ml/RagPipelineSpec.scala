package graft.ml

import graft.SparkSpec
import graft.sources.{BulkLoad, StoreConfig, VectorStoreCatalog}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class RagPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newCatalog = {
    val root = Files.createTempDirectory("graft_rag").toString
    new VectorStoreCatalog(spark, root)
  }

  test("hashing embedder: deterministic, unit-norm, fixed dim") {
    val e = HashingEmbedder(dimension = 64)
    val df = Seq("the quick brown fox", "the quick brown fox", "something else")
      .toDF("t")
    val out = e.embed(df, "t", "v").select($"v").collect().map(_.getSeq[Float](0))
    assert(out(0) == out(1), "same text must embed identically")
    assert(out(0) != out(2))
    assert(out.forall(_.length == 64))
    val norm = math.sqrt(out(0).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("end-to-end RAG: index documents, retrieve relevant chunk, format prompt") {
    val catalog = newCatalog
    val embedder = HashingEmbedder(dimension = 128)
    catalog.create("rag", "m", StoreConfig(dimension = 128))
    val rag = new RagPipeline(catalog, "rag", "m", embedder)

    val docs = Seq(
      (1L, "Spark excels at distributed columnar analytics. " * 8 +
        "Catalyst optimizes logical plans into physical plans."),
      (2L, "Cooking pasta requires salted boiling water. " * 8 +
        "Fresh basil makes tomato sauce fragrant."))
      .toDF("doc_id", "text")
    val nChunks = rag.indexDocuments(docs, "doc_id", "text", chunkSize = 120, overlap = 20)
    assert(nChunks > 2, s"expected multiple chunks, got $nChunks")
    assert(catalog.count("rag", "m") == nChunks)

    val ctx = rag.retrieveContext(
      "distributed columnar analytics with Spark",
      k = 3, minSimilarity = 0.1, maxContextLength = 2000)
    val rows = ctx.collect()
    assert(rows.nonEmpty, "expected at least one retrieved chunk")
    assert(rows.head.getAs[Long]("document_id") == 1L,
      s"top chunk should come from the Spark doc: ${rows.mkString(";")}")
    assert(rows.forall(_.getAs[Double]("similarity") >= 0.1))

    val prompt = rag.formatPrompt("distributed columnar analytics with Spark", ctx)
    assert(prompt.contains("[1]") && prompt.contains("Question:"))
  }

  test("retrieveContext enforces min_similarity and context cap") {
    val catalog = newCatalog
    val embedder = HashingEmbedder(dimension = 64)
    catalog.create("rag2", "m", StoreConfig(dimension = 64))
    val rag = new RagPipeline(catalog, "rag2", "m", embedder)
    rag.indexDocuments(
      Seq((1L, "alpha beta gamma delta " * 30)).toDF("doc_id", "text"),
      "doc_id", "text", chunkSize = 100, overlap = 0)
    // absurd threshold -> nothing passes
    assert(rag.retrieveContext("unrelated query entirely", k = 5,
      minSimilarity = 0.99).count() == 0)
    // tiny context cap -> at most one chunk fits
    val capped = rag.retrieveContext("alpha beta gamma delta", k = 5,
      minSimilarity = 0.0, maxContextLength = 100)
    assert(capped.count() <= 1)
  }

  test("bulk load: jsonl and csv round-trip into a store") {
    val catalog = newCatalog
    catalog.create("bulk", "m", StoreConfig(dimension = 3))
    val dir = Files.createTempDirectory("graft_bulk").toString

    Files.writeString(java.nio.file.Paths.get(s"$dir/vecs.jsonl"),
      """{"vector": [1,2,3], "metadata": {"src": "a"}}
        |{"vector": [4,5,6], "metadata": {"src": "b"}}""".stripMargin)
    val jd = BulkLoad.jsonl(spark, s"$dir/vecs.jsonl")
    assert(BulkLoad.bulkUpload(catalog, "bulk", "m", jd) == 2)

    Files.writeString(java.nio.file.Paths.get(s"$dir/vecs.csv"),
      "vector,src\n\"1,2,3\",c\n\"7,8,9\",d\n")
    val cd = BulkLoad.csv(spark, s"$dir/vecs.csv")
    assert(BulkLoad.bulkUpload(catalog, "bulk", "m", cd) == 2)

    assert(catalog.count("bulk", "m") == 4)
    val metas = catalog.load("bulk", "m")
      .select($"meta"("src")).collect().map(_.getString(0)).toSet
    assert(metas == Set("a", "b", "c", "d"))
  }
}

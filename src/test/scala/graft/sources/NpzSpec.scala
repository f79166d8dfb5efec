package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip against GOLDEN fixtures written by numpy itself
  * (src/test/resources, generated with np.savez / np.savez_compressed), so
  * the parser is checked against the real producer, not a self-made writer.
  */
class NpzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def resourcePath(name: String): String =
    getClass.getResource(s"/$name").getPath
  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    try in.readAllBytes() finally in.close()
  }

  test("parses numpy-written npz: shape, dtype, exact float values") {
    val arrays = Npy.parseNpz(resourceBytes("golden_vectors.npz"))
    val v = arrays("vectors")
    assert(v.descr == "<f4" && v.shape == Seq(25, 8))
    val m = v.toFloatMatrix
    // values cross-checked against numpy at generation time
    assert(m(0).take(4).toSeq == Seq(0.3047171f, -1.0399841f, 0.7504512f, 0.9405647f))
    assert(math.abs(m.map(_.map(_.toDouble).sum).sum - -6.090145) < 1e-5)
  }

  test("parses compressed npz (deflate members) and integer ids") {
    val arrays = Npy.parseNpz(resourceBytes("golden_vectors_compressed.npz"))
    assert(arrays("vectors").toFloatMatrix.length == 25)
    assert(arrays("ids").toLongVector.toSeq == (0L until 25L))
  }

  test("float64 npy widens to the store's float vectors") {
    val f8 = Npy.parseNpz(resourceBytes("golden_vectors_f8.npz"))("vectors")
    val f4 = Npy.parseNpz(resourceBytes("golden_vectors.npz"))("vectors")
    assert(f8.descr == "<f8")
    assert(f8.toFloatMatrix.map(_.toSeq).toSeq == f4.toFloatMatrix.map(_.toSeq).toSeq)
  }

  test("npz -> DataFrame -> store ingest -> kNN round trip") {
    val df = BulkLoad.npz(spark, resourcePath("golden_vectors.npz"))
    assert(df.count() == 25)
    // reference-minted metadata ids (batch_v1.py:408-410), disambiguated
    // across multi-file globs by source_file
    assert(df.select(col("meta")("id")).as[String].collect().toSet
      .contains("bulk_0"))
    assert(df.select(col("meta")("source_file")).as[String].collect().toSet
      == Set("golden_vectors.npz"))

    val cat = new VectorStoreCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_npz").toString)
    cat.create("u", "npz", StoreConfig(dimension = 8))
    assert(BulkLoad.bulkUpload(cat, "u", "npz", df) == 25L)
    // a stored vector must rank itself first
    val probe = df.limit(1).select(col("vector")).as[Seq[Float]].head().map(_.toDouble)
    val top = cat.query("u", "npz", probe, 1).select(col("similarity_score"))
      .as[Double].head()
    assert(math.abs(top - 1.0) < 1e-6)
  }

  test("ids member overrides minted metadata ids") {
    val df = BulkLoad.npz(spark, resourcePath("golden_vectors_compressed.npz"))
    val ids = df.select(col("meta")("id")).as[String].collect().toSet
    assert(ids == (0 until 25).map(_.toString).toSet)
  }

  test("ids member length mismatch fails fast with the file name") {
    val e = intercept[org.apache.spark.SparkException] {
      BulkLoad.npz(spark, resourcePath("golden_vectors_bad_ids.npz")).count()
    }
    val msg = e.getCause match { case c: Throwable => c.getMessage; case _ => e.getMessage }
    assert(msg.contains("10 entries for 25 vectors"), s"unhelpful error: $msg")
  }

  test("clear errors on wrong inputs") {
    intercept[IllegalArgumentException](Npy.parseNpy("not numpy".getBytes))
    val arrays = Npy.parseNpz(resourceBytes("golden_vectors.npz"))
    intercept[IllegalArgumentException](arrays("vectors").toLongVector)
  }
}

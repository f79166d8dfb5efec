package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.{MediaMeta, MediaRow, StubDecodeKernel}
import org.scalatest.funsuite.AnyFunSuite

/** The out-of-JVM decoder contract against a REAL subprocess
  * ([[FakeDecoderMain]] launched as `java -cp ...`): wire framing, batch
  * plumbing through `extractFeatures`, and every documented failure path
  * (row status, crash, timeout, truncated framing) under both policies.
  */
class SubprocessKernelSpec extends AnyFunSuite with SparkSpec {

  private val Dim = 8

  private def javaBin: String =
    s"${System.getProperty("java.home")}/bin/java"

  private def decoderCmd(extra: String*): Seq[String] =
    Seq(javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.multimodal.FakeDecoderMain", "--dim", Dim.toString) ++ extra

  private def row(id: Long, payload: String): MediaRow =
    MediaRow(id, "video", payload.getBytes("UTF-8"),
      MediaMeta(0, 0, "mp4", 1000L))

  private val batch = (0 until 5).map(i => row(i.toLong, s"media-payload-$i"))

  test("happy path: features come back framed, ordered, and exact") {
    val k = SubprocessDecodeKernel(decoderCmd(), Dim)
    val got = k.decodeBatch(batch)
    assert(got.length == batch.length)
    batch.zip(got).foreach { case (r, v) =>
      assert(v.toSeq == FakeDecoderMain.featureOf(r.bytes, Dim).toSeq,
        s"media ${r.media_id} features must match the deterministic contract")
    }
  }

  test("empty batch spawns nothing and returns nothing") {
    assert(SubprocessDecodeKernel(decoderCmd(), Dim).decodeBatch(Seq.empty).isEmpty)
  }

  test("extractFeatures runs the external decoder partition-local, batched") {
    val spark2 = spark
    import spark2.implicits._
    val media = spark.createDataset((0 until 40).map(i =>
      row(i.toLong, s"dist-$i")))
    val feats = Multimodal.extractFeatures(media,
        SubprocessDecodeKernel(decoderCmd(), Dim), batchSize = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.size == 40)
    (0 until 40).foreach { i =>
      assert(feats(i.toLong) ==
        FakeDecoderMain.featureOf(s"dist-$i".getBytes("UTF-8"), Dim).toSeq)
    }
  }

  test("row-level failure: scoped to the row under fallback, loud under error") {
    val fb = StubDecodeKernel(Dim)
    val k = SubprocessDecodeKernel(decoderCmd("--fail-row", "2"), Dim,
      onFailure = "fallback", fallback = Some(fb))
    val got = k.decodeBatch(batch)
    // rows 0,1,3,4 come from the decoder; row 2 from the in-JVM fallback
    batch.zipWithIndex.foreach { case (r, i) =>
      val expect =
        if (i == 2) fb.decodeBatch(Seq(r)).head.toSeq
        else FakeDecoderMain.featureOf(r.bytes, Dim).toSeq
      assert(got(i).toSeq == expect, s"row $i")
    }
    val loud = SubprocessDecodeKernel(decoderCmd("--fail-row", "2"), Dim)
    val e = intercept[IllegalArgumentException] { loud.decodeBatch(batch) }
    assert(e.getMessage.contains("media 2") && e.getMessage.contains("status 7"))
  }

  test("process crash: whole batch re-runs in-JVM under fallback, error carries stderr") {
    val fb = StubDecodeKernel(Dim)
    val k = SubprocessDecodeKernel(decoderCmd("--crash-after", "3"), Dim,
      onFailure = "fallback", fallback = Some(fb))
    val got = k.decodeBatch(batch)
    // batch-level isolation: ALL rows come from the fallback, including the
    // three the decoder answered before crashing (no half-decoded batches)
    batch.zipWithIndex.foreach { case (r, i) =>
      assert(got(i).toSeq == fb.decodeBatch(Seq(r)).head.toSeq, s"row $i")
    }
    val loud = SubprocessDecodeKernel(decoderCmd("--crash-after", "3"), Dim)
    val e = intercept[IllegalStateException] { loud.decodeBatch(batch) }
    assert(e.getMessage.contains("crashing at row 3"),
      s"stderr must surface in the error, got: ${e.getMessage}")
  }

  test("hung decoder: the batch deadline destroys it and the policy applies") {
    val fb = StubDecodeKernel(Dim)
    val k = SubprocessDecodeKernel(decoderCmd("--hang"), Dim,
      onFailure = "fallback", fallback = Some(fb), timeoutMs = 2000L)
    val t0 = System.nanoTime()
    val got = k.decodeBatch(batch)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(got.length == batch.length)
    assert(elapsedMs < 60000L, "the deadline, not the decoder, must bound the wait")
    val loud = SubprocessDecodeKernel(decoderCmd("--hang"), Dim, timeoutMs = 2000L)
    val e = intercept[IllegalStateException] { loud.decodeBatch(batch) }
    assert(e.getMessage.contains("timed out"), e.getMessage)
  }

  test("truncated framing is a process failure, not silent corruption") {
    val loud = SubprocessDecodeKernel(decoderCmd("--garbage"), Dim)
    val e = intercept[IllegalStateException] { loud.decodeBatch(batch) }
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("stream ended"),
      e.getMessage)
  }

  test("misconfiguration fails fast at construction") {
    intercept[IllegalArgumentException] {
      SubprocessDecodeKernel(decoderCmd(), Dim, onFailure = "fallback")
    }
    intercept[IllegalArgumentException] {
      SubprocessDecodeKernel(decoderCmd(), Dim, onFailure = "fallback",
        fallback = Some(StubDecodeKernel(Dim + 1)))
    }
    intercept[IllegalArgumentException] {
      SubprocessDecodeKernel(Seq.empty, Dim)
    }
    // a spawn failure is a process failure: fallback still saves the batch
    val fb = StubDecodeKernel(Dim)
    val ghost = SubprocessDecodeKernel(Seq("/nonexistent/decoder-binary"), Dim,
      onFailure = "fallback", fallback = Some(fb))
    assert(ghost.decodeBatch(batch).length == batch.length)
    val loudGhost = SubprocessDecodeKernel(Seq("/nonexistent/decoder-binary"), Dim)
    val e = intercept[IllegalStateException] { loudGhost.decodeBatch(batch) }
    assert(e.getMessage.contains("spawn failed"), e.getMessage)
  }
}

package graft.multimodal

import graft.multimodal.Multimodal.{MediaMeta, MediaRow, StubDecodeKernel}
import org.scalatest.funsuite.AnyFunSuite

/** The ffmpeg adapter behind [[SubprocessDecodeKernel]]: the
  * binary-absent path (process failure -> batch fallback) runs everywhere
  * python3 exists; the real-decode paths run only where an ffmpeg binary
  * is installed and SKIP cleanly otherwise (`assume`), so the suite is
  * green both ways.
  */
class FfmpegKernelsSpec extends AnyFunSuite {

  private def python3Available: Boolean =
    try {
      val p = new ProcessBuilder("python3", "--version")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  private def wavRow(id: Long, freq: Double, secs: Double): MediaRow = {
    val rate = 8000
    val n = (rate * secs).toInt
    val samples = Array.tabulate(n)(i =>
      0.6 * math.sin(2 * math.Pi * freq * i / rate))
    MediaRow(id, "audio", AudioCodec.encodeWavPcm16(rate, samples),
      MediaMeta(0, 0, "wav", (secs * 1000).toLong))
  }

  test("adapter script materializes from the classpath") {
    val p = java.nio.file.Paths.get(FfmpegKernels.scriptPath)
    assert(java.nio.file.Files.exists(p))
    val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(src.contains("--mode") && src.contains("ffmpeg"))
  }

  test("a misconfigured kernel fails fast at driver-side construction") {
    // the inner SubprocessDecodeKernel is built lazily on the executor, so
    // FfmpegKernel mirrors its policy requires to surface config errors at
    // build time instead of at the first decodeBatch mid-job
    intercept[IllegalArgumentException](
      FfmpegKernels.audioFeatures(onFailure = "fallback", fallback = None))
    intercept[IllegalArgumentException](
      FfmpegKernels.audioFeatures(dim = 64, onFailure = "fallback",
        fallback = Some(StubDecodeKernel(32)))) // dim mismatch
    intercept[IllegalArgumentException](
      FfmpegKernels.audioFeatures(onFailure = "retry"))
    intercept[IllegalArgumentException](FfmpegKernels.audioFeatures(dim = 0))
    intercept[IllegalArgumentException](
      FfmpegKernels.audioFeatures(timeoutMs = 0L))
  }

  test("missing ffmpeg binary is a PROCESS failure: batch lands on the fallback") {
    assume(python3Available, "python3 not runnable here")
    val dim = 8
    val stub = StubDecodeKernel(dim)
    val k = FfmpegKernels.audioFeatures(dim = dim,
      binary = "graft-no-such-ffmpeg-binary",
      onFailure = "fallback", fallback = Some(stub))
    val batch = Seq(wavRow(0, 440.0, 0.1), wavRow(1, 880.0, 0.1))
    val got = k.decodeBatch(batch)
    val expected = stub.decodeBatch(batch)
    assert(got.map(_.toSeq) == expected.map(_.toSeq),
      "the whole batch must re-run through the in-JVM fallback")
  }

  test("the kernel survives serialization and re-materializes its script") {
    // executors deserialize the kernel on JVMs where the driver's temp
    // file does not exist; the inner subprocess command must be rebuilt
    // lazily on the receiving side
    assume(python3Available, "python3 not runnable here")
    val dim = 8
    val stub = StubDecodeKernel(dim)
    val k = FfmpegKernels.audioFeatures(dim = dim,
      binary = "graft-no-such-ffmpeg-binary",
      onFailure = "fallback", fallback = Some(stub))
    val buf = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(buf)
    oos.writeObject(k); oos.close()
    val k2 = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(buf.toByteArray))
      .readObject().asInstanceOf[Multimodal.DecodeKernel]
    val batch = Seq(wavRow(0, 440.0, 0.1))
    assert(k2.decodeBatch(batch).map(_.toSeq) ==
      stub.decodeBatch(batch).map(_.toSeq))
  }

  test("missing ffmpeg under onFailure=error surfaces the adapter's stderr") {
    assume(python3Available, "python3 not runnable here")
    val k = FfmpegKernels.audioFeatures(dim = 8,
      binary = "graft-no-such-ffmpeg-binary")
    val e = intercept[IllegalStateException] {
      k.decodeBatch(Seq(wavRow(0, 440.0, 0.1)))
    }
    assert(e.getMessage.contains("ffmpeg binary not runnable"),
      s"message must carry the adapter's stderr, got: ${e.getMessage}")
  }

  test("audio: real ffmpeg decodes WAV into unit-norm time-bucket energies") {
    assume(python3Available, "python3 not runnable here")
    assume(FfmpegKernels.available(), "no ffmpeg binary installed here")
    val dim = 8
    val k = FfmpegKernels.audioFeatures(dim = dim)
    // loud first half, silent second half -> energy mass in early buckets
    val rate = 8000
    val loud = Array.tabulate(rate)(i =>
      if (i < rate / 2) 0.6 * math.sin(2 * math.Pi * 440.0 * i / rate) else 0.0)
    val row = MediaRow(7L, "audio", AudioCodec.encodeWavPcm16(rate, loud),
      MediaMeta(0, 0, "wav", 1000L))
    val Seq(v) = k.decodeBatch(Seq(row))
    assert(v.length == dim)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"expected unit norm, got $norm")
    val firstHalf = v.take(dim / 2).map(_.toDouble).sum
    val secondHalf = v.drop(dim / 2).map(_.toDouble).sum
    assert(firstHalf > secondHalf * 10,
      s"energy must sit in the loud half: $firstHalf vs $secondHalf")
  }

  test("audio: an undecodable row is row-scoped under fallback") {
    assume(python3Available, "python3 not runnable here")
    assume(FfmpegKernels.available(), "no ffmpeg binary installed here")
    val dim = 8
    val stub = StubDecodeKernel(dim)
    val k = FfmpegKernels.audioFeatures(dim = dim,
      onFailure = "fallback", fallback = Some(stub))
    val good = wavRow(0, 440.0, 0.1)
    val bad = MediaRow(1L, "audio", Array.fill[Byte](64)(0x5a),
      MediaMeta(0, 0, "mp3", 0L))
    val got = k.decodeBatch(Seq(good, bad))
    assert(got.length == 2)
    val norm = math.sqrt(got.head.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, "good row must decode via ffmpeg")
    assert(got(1).toSeq == stub.decodeBatch(Seq(bad)).head.toSeq,
      "bad row alone must land on the fallback")
  }

  test("video: real ffmpeg emits a 64-bit keyframe dHash") {
    assume(python3Available, "python3 not runnable here")
    assume(FfmpegKernels.available(), "no ffmpeg binary installed here")
    // synthesize a tiny H.264 clip with ffmpeg itself (testsrc gradient)
    val tmp = java.nio.file.Files.createTempFile("graft_ffspec", ".mp4")
    try {
      val gen = new ProcessBuilder("ffmpeg", "-y", "-hide_banner",
        "-loglevel", "error", "-f", "lavfi", "-i",
        "testsrc=duration=0.5:size=64x64:rate=8", "-pix_fmt", "yuv420p",
        tmp.toString).redirectErrorStream(true).start()
      gen.getInputStream.readAllBytes()
      assume(gen.waitFor() == 0, "local ffmpeg cannot synthesize H.264")
      val bytes = java.nio.file.Files.readAllBytes(tmp)
      val k = FfmpegKernels.videoKeyframeDHash()
      val Seq(v) = k.decodeBatch(Seq(
        MediaRow(0L, "video", bytes, MediaMeta(64, 64, "mp4", 500L))))
      assert(v.length == 64)
      assert(v.forall(x => x == 0.0f || x == 1.0f), "dHash bits are {0,1}")
      assert(v.exists(_ == 1.0f) && v.exists(_ == 0.0f),
        "a gradient test pattern has both rising and falling edges")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

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

  // ------------------------------------------------------ golden fixtures
  //
  // Checked-in media whose features are ANALYTICALLY exact, so the golden
  // could be recorded without a local decoder (this sandbox has no ffmpeg
  // and no encoder; compressed-codec fixtures would need one to produce):
  //  - rms_golden_16k.wav: 16 kHz mono PCM16 at the kernel's own rate, so
  //    ffmpeg's decode is a pure s16 -> f32 passthrough (x/32768, exact —
  //    no resampler in the chain) and each 250-sample bucket holds a
  //    constant magnitude k_b = 512*b + 128, so RMS_b = k_b/32768 exactly;
  //    the golden replays the adapter's exact arithmetic (f64 sums in
  //    order, L2 normalize, f32 cast).
  //  - dhash_golden_9x8.y4m: raw mono Y4M already AT the 9x8 dHash
  //    geometry (scale=9:8 is an exact copy) with a checkerboard +/-12
  //    luma walk — big enough steps that any monotone luma mapping keeps
  //    every adjacent comparison strict; frame 2 is the INVERSE pattern,
  //    so reading the wrong frame flips every bit.
  // The real-decode legs assert bit-exact equality where ffmpeg exists;
  // the fixture-shape legs run everywhere.

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/multimodal/fixtures/$name")
    require(in != null, s"missing fixture resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** Recorded golden for rms_golden_16k.wav (adapter arithmetic replayed
    * offline; every step exact or deterministically rounded — see the
    * fixture note above).
    */
  private val AudioGolden: Array[Float] = Array(
    0.0008507338934578001f, 0.0042536696419119835f, 0.007656605448573828f,
    0.011059541255235672f, 0.014462476596236229f, 0.017865411937236786f,
    0.021268347278237343f, 0.02467128448188305f, 0.028074219822883606f,
    0.031477153301239014f, 0.03488009050488472f, 0.038283027708530426f,
    0.041685961186885834f, 0.04508889839053154f, 0.04849183186888695f,
    0.051894769072532654f, 0.05529770627617836f, 0.05870063975453377f,
    0.062103576958179474f, 0.06550651043653488f, 0.06890944391489029f,
    0.0723123848438263f, 0.0757153183221817f, 0.07911825180053711f,
    0.08252119272947311f, 0.08592412620782852f, 0.08932705968618393f,
    0.09273000061511993f, 0.09613293409347534f, 0.09953586757183075f,
    0.10293880105018616f, 0.10634174197912216f, 0.10974467545747757f,
    0.11314760893583298f, 0.11655054986476898f, 0.11995348334312439f,
    0.1233564168214798f, 0.1267593502998352f, 0.1301622837781906f,
    0.13356523215770721f, 0.13696816563606262f, 0.14037109911441803f,
    0.14377403259277344f, 0.14717696607112885f, 0.15057989954948425f,
    0.15398283302783966f, 0.15738578140735626f, 0.16078871488571167f,
    0.16419164836406708f, 0.16759458184242249f, 0.1709975153207779f,
    0.1744004487991333f, 0.1778033822774887f, 0.1812063306570053f,
    0.18460926413536072f, 0.18801219761371613f, 0.19141513109207153f,
    0.19481806457042694f, 0.19822099804878235f, 0.20162394642829895f,
    0.20502687990665436f, 0.20842981338500977f, 0.21183274686336517f,
    0.21523568034172058f)

  /** Recorded golden for dhash_golden_9x8.y4m frame 1: checkerboard —
    * bit(r,c) = 1 iff (r+c) even.
    */
  private val VideoGolden: Array[Float] =
    (for (r <- 0 until 8; c <- 0 until 8)
      yield if ((r + c) % 2 == 0) 1.0f else 0.0f).toArray

  test("fixtures: checked-in golden media parse and match their recorded shape") {
    // runs WITHOUT ffmpeg: the fixtures and goldens stay exercised here
    val wav = fixture("rms_golden_16k.wav")
    assert(wav.length == 32044, "16000 s16 samples + 44-byte RIFF header")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val y4m = fixture("dhash_golden_9x8.y4m")
    assert(new String(y4m.take(34), "US-ASCII")
      .startsWith("YUV4MPEG2 W9 H8"), "9x8 mono y4m header")
    assert(y4m.length == 35 + 2 * (6 + 72), "two FRAME-prefixed 72-byte planes")
    assert(AudioGolden.length == 64 && VideoGolden.length == 64)
    val norm = math.sqrt(AudioGolden.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, "recorded audio golden is unit-norm")
  }

  test("audio golden: real decode reproduces the recorded RMS vector bit-exactly") {
    assume(python3Available, "python3 not runnable here")
    assume(FfmpegKernels.available(), "no ffmpeg binary installed here")
    val k = FfmpegKernels.audioFeatures(dim = 64, rate = 16000)
    val Seq(v) = k.decodeBatch(Seq(MediaRow(0L, "audio",
      fixture("rms_golden_16k.wav"), MediaMeta(0, 0, "wav", 1000L))))
    assert(v.toSeq == AudioGolden.toSeq,
      "the decoded feature vector must equal the recorded golden exactly")
  }

  test("video golden: real decode emits the recorded first-keyframe dHash") {
    assume(python3Available, "python3 not runnable here")
    assume(FfmpegKernels.available(), "no ffmpeg binary installed here")
    val k = FfmpegKernels.videoKeyframeDHash()
    val Seq(v) = k.decodeBatch(Seq(MediaRow(1L, "video",
      fixture("dhash_golden_9x8.y4m"), MediaMeta(9, 8, "y4m", 250L))))
    assert(v.toSeq == VideoGolden.toSeq,
      "frame-2's inverse pattern means a wrong-frame read flips every bit")
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

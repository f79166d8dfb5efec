package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sine(freq: Double, rate: Int, seconds: Double, amp: Double = 0.5) =
    Array.tabulate((rate * seconds).toInt)(i =>
      amp * math.sin(2 * math.Pi * freq * i / rate))

  test("WAV PCM16 round-trip: encode -> decode within quantization error") {
    val rate = 8000
    val src = sine(440.0, rate, 0.1)
    val decoded = AudioCodec.decodeWavPcm(AudioCodec.encodeWavPcm16(rate, src))
    assert(decoded.sampleRate == rate && decoded.channels == 1)
    assert(decoded.samples.length == src.length)
    val maxErr = decoded.samples.zip(src).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 1.5 / 32768.0, s"quantization error $maxErr too large")
  }

  test("stereo 16-bit WAV mixes channels to mono") {
    // hand-build a stereo WAV: L = 0.5, R = -0.5 constant -> mono mix 0.0;
    // then L = R = 0.25 -> mix 0.25
    val rate = 4000
    val frames = 100
    val buf = java.nio.ByteBuffer.allocate(44 + frames * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + frames * 4); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(2)
    buf.putInt(rate); buf.putInt(rate * 4)
    buf.putShort(4); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(frames * 4)
    for (f <- 0 until frames) {
      if (f < 50) { buf.putShort(16384); buf.putShort(-16384) }
      else { buf.putShort(8192); buf.putShort(8192) }
    }
    val a = AudioCodec.decodeWavPcm(buf.array())
    assert(a.channels == 2 && a.samples.length == frames)
    assert(math.abs(a.samples(0)) < 1e-9, "L/R opposites must cancel")
    assert(math.abs(a.samples(60) - 0.25) < 1e-3)
  }

  test("8-bit and float32 WAV variants decode") {
    val rate = 4000
    // 8-bit unsigned: 128 = silence, 255 ~ +1
    val b8 = java.nio.ByteBuffer.allocate(44 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes); b8.putInt(36 + 4); b8.put("WAVE".getBytes)
    b8.put("fmt ".getBytes); b8.putInt(16)
    b8.putShort(1); b8.putShort(1); b8.putInt(rate); b8.putInt(rate)
    b8.putShort(1); b8.putShort(8)
    b8.put("data".getBytes); b8.putInt(4)
    b8.put(128.toByte); b8.put(255.toByte); b8.put(0.toByte); b8.put(192.toByte)
    val a8 = AudioCodec.decodeWavPcm(b8.array())
    assert(math.abs(a8.samples(0)) < 1e-9)
    assert(math.abs(a8.samples(1) - 127.0 / 128.0) < 1e-9)
    assert(math.abs(a8.samples(2) + 1.0) < 1e-9)

    // float32 (format 3)
    val bf = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bf.put("RIFF".getBytes); bf.putInt(36 + 8); bf.put("WAVE".getBytes)
    bf.put("fmt ".getBytes); bf.putInt(16)
    bf.putShort(3); bf.putShort(1); bf.putInt(rate); bf.putInt(rate * 4)
    bf.putShort(4); bf.putShort(32)
    bf.put("data".getBytes); bf.putInt(8)
    bf.putFloat(0.75f); bf.putFloat(-0.125f)
    val af = AudioCodec.decodeWavPcm(bf.array())
    assert(math.abs(af.samples(0) - 0.75) < 1e-7)
    assert(math.abs(af.samples(1) + 0.125) < 1e-7)
  }

  test("AIFF decodes through the javax.sound fallback") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = 8000
    val src = sine(440.0, rate, 0.05)
    val pcm = new Array[Byte](src.length * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.BIG_ENDIAN)
    src.foreach(v => bb.putShort(math.round(v * 32767.0).toShort))
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, true)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, src.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, out)
    val bytes = out.toByteArray
    assert(AudioCodec.canDecode(bytes))
    val a = AudioCodec.decode(bytes)
    assert(a.sampleRate == rate && a.samples.length == src.length)
    val maxErr = a.samples.zip(src).map { case (x, y) => math.abs(x - y) }.max
    assert(maxErr <= 1.5 / 32768.0, s"AIFF path error $maxErr")
  }

  test("features: rms/peak/zcr/envelope sanity on a known sine") {
    val rate = 8000
    val a = AudioCodec.RawAudio(rate, 1, sine(400.0, rate, 0.5, amp = 0.8))
    val f = AudioCodec.features(a, envelopeBins = 8)
    assert(f.length == 11)
    assert(math.abs(f(0) - 0.8 / math.sqrt(2.0)) < 0.01, s"rms ${f(0)}")
    assert(math.abs(f(1) - 0.8) < 0.01, s"peak ${f(1)}")
    // 400 Hz crosses zero ~800 times/s -> zcr ~ 800/8000 = 0.1 per sample
    assert(math.abs(f(2) - 0.1) < 0.01, s"zcr ${f(2)}")
    // constant-amplitude tone -> flat envelope, each bin ~ 1/8
    (3 until 11).foreach(i => assert(math.abs(f(i) - 0.125) < 0.01, s"env bin $i: ${f(i)}"))
    // empty audio yields all zeros, no NaN
    val z = AudioCodec.features(AudioCodec.RawAudio(rate, 1, Array.empty), 8)
    assert(z.forall(v => v == 0.0f && !v.isNaN))
  }

  test("RawAudioKernel end to end: planted duplicate clips are nearest neighbors") {
    val rate = 8000
    def clip(freq: Double, amp: Double) =
      AudioCodec.encodeWavPcm16(rate, sine(freq, rate, 0.1, amp))
    val rows = Seq(
      Multimodal.MediaRow(0L, "audio", clip(440, 0.5), Multimodal.MediaMeta(0, 0, "wav", 100)),
      Multimodal.MediaRow(1L, "audio", clip(440, 0.5), Multimodal.MediaMeta(0, 0, "wav", 100)),
      Multimodal.MediaRow(2L, "audio", clip(1200, 0.2), Multimodal.MediaMeta(0, 0, "wav", 100)))
    val feats = Multimodal.extractFeatures(
      spark.createDataset(rows), Multimodal.RawAudioKernel(envelopeBins = 8))
      .collect().sortBy(_.media_id)
    assert(feats.length == 3)
    def cos(a: Array[Float], b: Array[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val dupSim = cos(feats(0).features, feats(1).features)
    val diffSim = cos(feats(0).features, feats(2).features)
    assert(dupSim > 0.9999, s"identical clips must match, got $dupSim")
    assert(dupSim > diffSim, s"dup $dupSim should beat different clip $diffSim")
  }

  test("undecodable policy: error throws, stub keeps mixed corpora flowing") {
    val junk = Multimodal.MediaRow(7L, "audio", Array.fill[Byte](32)(9),
      Multimodal.MediaMeta(0, 0, "mp3", 100))
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(
        spark.createDataset(Seq(junk)), Multimodal.RawAudioKernel()).collect()
    }
    assert(err.getMessage.contains("no JVM decoder") ||
      err.getCause.getMessage.contains("no JVM decoder"))
    val stubbed = Multimodal.extractFeatures(
      spark.createDataset(Seq(junk)),
      Multimodal.RawAudioKernel(envelopeBins = 8, undecodable = "stub")).collect()
    assert(stubbed.length == 1 && stubbed.head.features.length == 11)
  }
}

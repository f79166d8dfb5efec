package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class VideoCodecSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Solid-color JPEG via the JDK encoder (the same plugin family the image
    * path decodes with).
    */
  private def jpegFrame(r: Int, g: Int, b: Int, w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def dominantChannel(img: ImageCodec.RawImage): Int = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      sr += img.r(x, y); sg += img.g(x, y); sb += img.b(x, y)
    }
    Seq(sr, sg, sb).zipWithIndex.maxBy(_._1)._2
  }

  test("AVI round-trip: encode MJPEG -> demux -> decode each frame") {
    val frames = Seq(jpegFrame(200, 0, 0), jpegFrame(0, 200, 0), jpegFrame(0, 0, 200))
    val avi = VideoCodec.encodeAviMjpeg(40000L, frames) // 25 fps
    assert(VideoCodec.canDemux(avi))
    val demuxed = VideoCodec.demuxAvi(avi)
    assert(demuxed.microSecPerFrame == 40000L)
    assert(demuxed.frames.length == 3)
    assert(demuxed.durationMs == 120L)
    // every demuxed payload is a standalone JPEG the image path decodes
    val dominant = demuxed.frames.map(f => dominantChannel(ImageCodec.decode(f)))
    assert(dominant == Seq(0, 1, 2), s"got channel order $dominant")
  }

  test("frameIndexAt clamps to the stream and maps cadence correctly") {
    val v = VideoCodec.AviVideo(40000L, IndexedSeq(Array[Byte](1), Array[Byte](2), Array[Byte](3)))
    assert(v.frameIndexAt(0) == 0)
    assert(v.frameIndexAt(39) == 0)
    assert(v.frameIndexAt(40) == 1)
    assert(v.frameIndexAt(85) == 2)
    assert(v.frameIndexAt(100000) == 2) // clamped
    assert(v.frameIndexAt(-5) == 0)
  }

  test("sampleFrames extracts REAL frames from AVI and stubs unknown containers") {
    val frames = Seq(jpegFrame(200, 0, 0), jpegFrame(0, 200, 0), jpegFrame(0, 0, 200))
    val avi = VideoCodec.encodeAviMjpeg(40000L, frames)
    val mkvish = Array.fill[Byte](64)(0x1a) // no JVM decoder
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi, Multimodal.MediaMeta(32, 32, "avi", 0L)),
      Multimodal.MediaRow(2L, "video", mkvish, Multimodal.MediaMeta(0, 0, "mkv", 80L)))
    val out = Multimodal.sampleFrames(spark.createDataset(rows), everyMs = 40L)
      .collect().groupBy(_.media_id)

    // real path: duration from the container (120 ms -> ts 0,40,80,120),
    // frame bytes are decodable JPEGs following the cadence
    val real = out(1L).sortBy(_.frame_index)
    assert(real.map(_.ts_ms).toSeq == Seq(0L, 40L, 80L, 120L))
    val dominant = real.map(f => dominantChannel(ImageCodec.decode(f.frame_bytes))).toSeq
    assert(dominant == Seq(0, 1, 2, 2), s"got $dominant") // ts=120 clamps to last
    // stub path: duration from row meta, tagged stand-in bytes
    val stub = out(2L).sortBy(_.frame_index)
    assert(stub.map(_.ts_ms).toSeq == Seq(0L, 40L, 80L))
    assert(stub.forall(_.frame_bytes.length == 16))
  }

  test("demux rejects truncated containers instead of mis-slicing") {
    val avi = VideoCodec.encodeAviMjpeg(40000L, Seq(jpegFrame(10, 20, 30)))
    val truncated = java.util.Arrays.copyOfRange(avi, 0, avi.length - 40)
    intercept[IllegalArgumentException](VideoCodec.demuxAvi(truncated))
  }
}

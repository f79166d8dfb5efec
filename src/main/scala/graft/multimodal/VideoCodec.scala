package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM video demux for the multimodal pipeline: RIFF/AVI container
  * parsing with real frame extraction for MJPEG (each frame chunk is a
  * standalone JPEG that [[ImageCodec]] decodes) and raw DIB streams. No
  * external codec libraries; inter-frame-compressed codecs (H.264/VP9/AV1,
  * and MP4/MKV containers) have no JVM decoder and keep the stub path in
  * [[Multimodal.sampleFrames]].
  *
  * Reference scope note: the reference has no media pipeline — this is part
  * of the 100 TB training-data extension surface (builder brief; SURVEY.md
  * north star). Demux runs partition-local, never on the driver.
  */
object VideoCodec {

  /** Demuxed AVI video stream: per-frame payload bytes (MJPEG: one JPEG per
    * frame) plus the container's frame cadence.
    */
  case class AviVideo(microSecPerFrame: Long, frames: IndexedSeq[Array[Byte]]) {
    require(microSecPerFrame > 0, s"bad frame interval $microSecPerFrame us")
    def durationMs: Long = frames.length.toLong * microSecPerFrame / 1000L
    /** Index of the frame covering timestamp `tsMs` (clamped to the end). */
    def frameIndexAt(tsMs: Long): Int =
      math.min(math.max(tsMs, 0L) * 1000L / microSecPerFrame,
        (frames.length - 1).toLong).toInt
  }

  def isAvi(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  def canDemux(bytes: Array[Byte]): Boolean = isAvi(bytes)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  /** Walk the RIFF chunk tree: `avih` gives the frame cadence; video frame
    * chunks (`##dc` compressed / `##db` uncompressed, `##` = stream number)
    * inside `LIST movi` carry the payloads, in presentation order.
    */
  def demuxAvi(bytes: Array[Byte]): AviVideo = {
    require(isAvi(bytes), "not a RIFF/AVI container")
    var usPerFrame = 0L
    val frames = ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(bytes, o + 4)
        require(size >= 0 && o + 8 + size <= bytes.length, s"chunk '$id' overruns buffer")
        if (id == "LIST") walk(o + 12, o + 8 + size) // skip the 4-byte subtype
        else if (id == "avih" && size >= 4) usPerFrame = le32(bytes, o + 8).toLong & 0xffffffffL
        else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db")) && size > 0)
          frames += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
        o += 8 + size + (size & 1) // odd chunks are padded
      }
    }
    walk(12, bytes.length)
    require(frames.nonEmpty, "no video frame chunks in AVI")
    AviVideo(if (usPerFrame > 0) usPerFrame else 40000L, frames.toIndexedSeq)
  }

  /** Test/storage twin of [[demuxAvi]]: a minimal MJPEG AVI from per-frame
    * payloads (each typically a JPEG). Emits the `avih` header and a
    * `LIST movi` of `00dc` chunks — exactly the structure the demuxer and
    * common players read.
    */
  def encodeAviMjpeg(microSecPerFrame: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(microSecPerFrame > 0 && microSecPerFrame <= 0xffffffffL,
      s"bad frame interval $microSecPerFrame us")
    require(frames.nonEmpty, "no frames")
    def pad(n: Int) = n + (n & 1)
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize // 'hdrl' + avih chunk
    val moviBody = 4 + frames.map(f => 8 + pad(f.length)).sum // 'movi' + chunks
    val riffBody = 4 + (8 + hdrlSize) + (8 + moviBody) // 'AVI ' + two LISTs
    val buf = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(riffBody); buf.put("AVI ".getBytes)
    buf.put("LIST".getBytes); buf.putInt(hdrlSize); buf.put("hdrl".getBytes)
    buf.put("avih".getBytes); buf.putInt(avihSize)
    buf.putInt(microSecPerFrame.toInt) // dwMicroSecPerFrame
    buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.putInt(frames.length) // dwTotalFrames
    (0 until 9).foreach(_ => buf.putInt(0)) // remaining avih fields
    buf.put("LIST".getBytes); buf.putInt(moviBody); buf.put("movi".getBytes)
    frames.foreach { f =>
      buf.put("00dc".getBytes); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }
}

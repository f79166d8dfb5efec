package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** JVM-native image decode, no external dependencies:
  *  - PPM (P6) and 24-bit BMP through hand-rolled header parsers (zero-copy
  *    raster slice for PPM — the fast path for synthetic/test corpora);
  *  - PNG / JPEG / GIF / other BMP variants through `javax.imageio`, which
  *    ships with the JDK (public platform API, codec plugins included).
  * So the multimodal pipeline is real end to end for every mainstream image
  * container: bytes -> pixels -> resize -> features -> vector store. Audio
  * has the same treatment in [[AudioCodec]] (WAV/AIFF/AU); [[VideoCodec]]
  * demuxes AVI/MJPEG frames; only compressed audio (MP3/AAC) and modern
  * video codecs lack a JVM decoder and fall back to the stub kernel.
  *
  * Reference scope note: the reference has no media pipeline at all — this
  * is part of the 100 TB training-data extension surface (builder brief;
  * SURVEY.md north star), built operator-first: decode and featurize run
  * partition-local inside [[Multimodal.extractFeatures]]'s bounded batches,
  * never on the driver.
  */
object ImageCodec {

  /** Row-major packed RGB, 3 bytes per pixel. */
  case class RawImage(width: Int, height: Int, rgb: Array[Byte]) {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length}B != $width*$height*3")
    def r(x: Int, y: Int): Int = rgb((y * width + x) * 3) & 0xff
    def g(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 1) & 0xff
    def b(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 2) & 0xff
  }

  private def isPpm(b: Array[Byte]) = b.length > 2 && b(0) == 'P' && b(1) == '6'
  private def isBmp(b: Array[Byte]) = b.length > 2 && b(0) == 'B' && b(1) == 'M'
  private def isPng(b: Array[Byte]) =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]) =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff
  private def isGif(b: Array[Byte]) =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  def canDecode(bytes: Array[Byte]): Boolean =
    isPpm(bytes) || isBmp(bytes) || isPng(bytes) || isJpeg(bytes) || isGif(bytes)

  def decode(bytes: Array[Byte]): RawImage =
    if (isPpm(bytes)) decodePpm(bytes)
    else if (isBmp(bytes)) {
      // pure-JVM fast path for the common 24-bit case; other BMP variants
      // (32-bpp, RLE, palettized) and malformed headers fall through to the
      // imageio plugin, whose failure (null reader) is the decisive error
      try decodeBmp24(bytes)
      catch { case scala.util.control.NonFatal(_) => decodeImageIO(bytes) }
    }
    else if (isPng(bytes) || isJpeg(bytes) || isGif(bytes)) decodeImageIO(bytes)
    else throw new IllegalArgumentException(
      "undecodable image (supported: PPM P6, BMP, PNG, JPEG, GIF)")

  /** Compressed-format decode through the JDK's built-in `javax.imageio`
    * plugins (PNG/JPEG/GIF/BMP/WBMP). Pixels are normalized to packed sRGB
    * via `getRGB`, so downstream features see one colorspace regardless of
    * the container's bit depth or palette; alpha is dropped (features are
    * RGB-only).
    */
  def decodeImageIO(bytes: Array[Byte]): RawImage = {
    // Executor-local decode must never spill ImageIO scratch to disk temp
    // files. Scoped per call via an explicit in-memory ImageInputStream —
    // NOT via ImageIO.setUseCache(false), which would mutate JVM-global
    // state for every other in-process ImageIO user as a side effect.
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself on success;
    // the guarded close covers the null-reader path without double-closing.
    val img = try javax.imageio.ImageIO.read(stream)
      finally { try stream.close() catch { case _: java.io.IOException => () } }
    require(img != null, "javax.imageio found no reader for these bytes")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val p = px(i)
      out(i * 3) = ((p >> 16) & 0xff).toByte
      out(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      out(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    RawImage(w, h, out)
  }

  /** PNG encoder (lossless round-trip tests and store-ready thumbnails). */
  def encodePng(img: RawImage): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](img.width * img.height)
    var i = 0
    while (i < px.length) {
      px(i) = ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** PPM P6: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB.
    * '#' comments allowed in the header per the netpbm spec.
    */
  def decodePpm(bytes: Array[Byte]): RawImage = {
    var pos = 2 // past "P6"
    def skipWsAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else going = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, s"malformed PPM header at byte $pos")
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(maxval == 255, s"only maxval=255 PPM supported, got $maxval")
    pos += 1 // exactly one whitespace byte before the raster
    require(bytes.length - pos >= w * h * 3,
      s"PPM raster truncated: ${bytes.length - pos}B for ${w}x$h")
    RawImage(w, h, bytes.slice(pos, pos + w * h * 3))
  }

  /** BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, uncompressed,
    * bottom-up rows padded to 4 bytes, pixels stored BGR.
    */
  def decodeBmp24(bytes: Array[Byte]): RawImage = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed BMP supported (bpp=$bpp, compression=$compression)")
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    val rowBytes = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val src = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        out(i) = bytes(src + x * 3 + 2)     // R (stored BGR)
        out(i + 1) = bytes(src + x * 3 + 1) // G
        out(i + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    RawImage(w, h, out)
  }

  /** PPM P6 encoder (round-trip tests and frame dumps). */
  def encodePpm(img: RawImage): Array[Byte] =
    s"P6\n${img.width} ${img.height}\n255\n".getBytes(StandardCharsets.US_ASCII) ++ img.rgb

  /** Box-average resize (area sampling): each target pixel averages its
    * source cell — the standard pre-model downscale.
    */
  def resize(img: RawImage, w: Int, h: Int): RawImage = {
    require(w > 0 && h > 0, s"bad target ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var ty = 0
    while (ty < h) {
      val y0 = ty * img.height / h
      val y1 = math.max(y0 + 1, (ty + 1) * img.height / h)
      var tx = 0
      while (tx < w) {
        val x0 = tx * img.width / w
        val x1 = math.max(x0 + 1, (tx + 1) * img.width / w)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * img.width + x) * 3
            sr += img.rgb(i) & 0xff; sg += img.rgb(i + 1) & 0xff; sb += img.rgb(i + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val o = (ty * w + tx) * 3
        out(o) = (sr / n).toByte; out(o + 1) = (sg / n).toByte; out(o + 2) = (sb / n).toByte
        tx += 1
      }
      ty += 1
    }
    RawImage(w, h, out)
  }

  /** L1-normalized RGB color histogram, `binsPerChannel`^3 dims — the classic
    * retrieval feature; 4 bins/channel = the engine's default 64-dim vector.
    */
  def rgbHistogram(img: RawImage, binsPerChannel: Int = 4): Array[Float] = {
    require(binsPerChannel >= 1 && binsPerChannel <= 16, s"bins out of range: $binsPerChannel")
    val hist = new Array[Float](binsPerChannel * binsPerChannel * binsPerChannel)
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val r = (img.rgb(i * 3) & 0xff) * binsPerChannel / 256
      val g = (img.rgb(i * 3 + 1) & 0xff) * binsPerChannel / 256
      val b = (img.rgb(i * 3 + 2) & 0xff) * binsPerChannel / 256
      hist((r * binsPerChannel + g) * binsPerChannel + b) += 1f
      i += 1
    }
    var j = 0
    while (j < hist.length) { hist(j) /= n; j += 1 }
    hist
  }

  /** Mean-luminance grid (gw x gh dims): cheap spatial-structure feature. */
  def grayGrid(img: RawImage, gw: Int = 8, gh: Int = 8): Array[Float] = {
    val small = resize(img, gw, gh)
    val out = new Array[Float](gw * gh)
    var i = 0
    while (i < gw * gh) {
      val r = small.rgb(i * 3) & 0xff
      val g = small.rgb(i * 3 + 1) & 0xff
      val b = small.rgb(i * 3 + 2) & 0xff
      out(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
      i += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): area-average downsample to a 9x8
    * luminance grid, one bit per horizontal neighbor comparison
    * (bit = left < right). Robust to recompression, resizing, and mild
    * global brightness/contrast shifts (monotone pixel transforms preserve
    * the comparisons); integer luma keeps it bit-deterministic across
    * platforms. Pairs with [[graft.operators.Dedup.nearDupPairsHamming64]]
    * for corpus-scale image near-dup.
    */
  def dHash(img: RawImage): Long = {
    val small = resize(img, 9, 8)
    def luma(x: Int, y: Int): Int = {
      val i = (y * 9 + x) * 3
      (299 * (small.rgb(i) & 0xff) + 587 * (small.rgb(i + 1) & 0xff) +
        114 * (small.rgb(i + 2) & 0xff)) / 1000
    }
    var fp = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x, y) < luma(x + 1, y)) fp |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    fp
  }
}

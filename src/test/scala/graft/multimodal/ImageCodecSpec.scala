package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite with SparkSpec {
  import ImageCodec._

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): RawImage =
    RawImage(w, h, Array.tabulate(w * h * 3) { i =>
      (i % 3 match { case 0 => r; case 1 => g; case 2 => b }).toByte
    })

  test("PPM P6 round trip, including header comments") {
    val img = solid(5, 4, 200, 10, 30)
    val back = decode(encodePpm(img))
    assert(back.width == 5 && back.height == 4)
    assert(back.rgb.toSeq == img.rgb.toSeq)
    // header with a comment line (netpbm spec)
    val withComment = ("P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6))
    val c = decode(withComment)
    assert(c.width == 2 && c.height == 1 && c.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("BMP 24-bit decode: bottom-up rows, BGR order, 4-byte row padding") {
    // 2x2 image: top row RED GREEN / bottom row BLUE WHITE.
    // BMP stores bottom row first, BGR, rows padded to 4 bytes (2*3=6 -> 8).
    val header = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put('B'.toByte).put('M'.toByte)
    header.putInt(54 + 16) // file size
    header.putInt(0)       // reserved
    header.putInt(54)      // data offset
    header.putInt(40)      // info header size
    header.putInt(2)       // width
    header.putInt(2)       // height (positive => bottom-up)
    header.putShort(1)     // planes
    header.putShort(24)    // bpp
    header.putInt(0)       // compression
    header.putInt(16)      // image size
    header.putInt(0).putInt(0).putInt(0).putInt(0)
    val pixels = Array[Byte](
      // bottom row: BLUE (B,G,R = 255,0,0), WHITE (255,255,255), pad x2
      -1, 0, 0, -1, -1, -1, 0, 0,
      // top row: RED (0,0,255), GREEN (0,255,0), pad x2
      0, 0, -1, 0, -1, 0, 0, 0)
    val img = decode(header.array() ++ pixels)
    assert((img.r(0, 0), img.g(0, 0), img.b(0, 0)) == (255, 0, 0))   // top-left red
    assert((img.r(1, 0), img.g(1, 0), img.b(1, 0)) == (0, 255, 0))   // top-right green
    assert((img.r(0, 1), img.g(0, 1), img.b(0, 1)) == (0, 0, 255))   // bottom-left blue
    assert((img.r(1, 1), img.g(1, 1), img.b(1, 1)) == (255, 255, 255))
  }

  test("box-average resize: uniform stays uniform, checkerboard averages") {
    val uni = resize(solid(10, 10, 100, 150, 200), 3, 3)
    assert((0 until 3).forall(y => (0 until 3).forall(x =>
      uni.r(x, y) == 100 && uni.g(x, y) == 150 && uni.b(x, y) == 200)))
    // 2x2 black/white checkerboard -> 1x1 mid-gray (avg of 0,255,255,0 = 127)
    val checker = RawImage(2, 2, Array[Byte](
      0, 0, 0, -1, -1, -1,
      -1, -1, -1, 0, 0, 0))
    val one = resize(checker, 1, 1)
    assert(one.r(0, 0) == 127 && one.g(0, 0) == 127 && one.b(0, 0) == 127)
  }

  test("rgb histogram: solid color puts all mass in one bin, L1-normalized") {
    val h = rgbHistogram(solid(8, 8, 250, 5, 5), binsPerChannel = 4)
    assert(h.length == 64)
    assert(math.abs(h.sum - 1.0) < 1e-6)
    // r=250 -> bin 3, g=b=5 -> bin 0 => index (3*4+0)*4+0 = 48
    assert(h(48) == 1.0f)
  }

  test("grayGrid: luminance ordering black < gray < white") {
    val gBlack = grayGrid(solid(4, 4, 0, 0, 0), 2, 2)
    val gGray = grayGrid(solid(4, 4, 128, 128, 128), 2, 2)
    val gWhite = grayGrid(solid(4, 4, 255, 255, 255), 2, 2)
    assert(gBlack.forall(_ == 0f) && gWhite.forall(v => math.abs(v - 1f) < 1e-3))
    assert(gGray.forall(v => v > 0.4f && v < 0.6f))
  }

  test("RawImageKernel end-to-end: real decode through the batched pipeline") {
    import spark.implicits._
    val red = Multimodal.MediaRow(0L, "image", encodePpm(solid(16, 16, 240, 10, 10)),
      Multimodal.MediaMeta(16, 16, "ppm", 0))
    val red2 = Multimodal.MediaRow(1L, "image", encodePpm(solid(8, 8, 250, 5, 5)),
      Multimodal.MediaMeta(8, 8, "ppm", 0))
    val blue = Multimodal.MediaRow(2L, "image", encodePpm(solid(16, 16, 10, 10, 240)),
      Multimodal.MediaMeta(16, 16, "ppm", 0))
    val ds = spark.createDataset(Seq(red, red2, blue))
    val feats = Multimodal.extractFeatures(ds, Multimodal.RawImageKernel())
      .collect().map(f => f.media_id -> f.features).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(feats(0L), feats(1L)) > 0.99, "two red images must match")
    assert(cos(feats(0L), feats(2L)) < 0.5, "red vs blue must not match")
  }

  test("PNG round trip is lossless via javax.imageio") {
    val img = RawImage(6, 3, Array.tabulate(6 * 3 * 3)(i => ((i * 37 + 11) % 256).toByte))
    val png = encodePng(img)
    assert(canDecode(png), "PNG magic must be recognized")
    val back = decode(png)
    assert(back.width == 6 && back.height == 3)
    assert(back.rgb.toSeq == img.rgb.toSeq, "PNG is lossless — pixels must be exact")
  }

  test("JPEG decode: lossy but close on a solid color") {
    val img = solid(16, 16, 180, 60, 30)
    val bi = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) bi.setRGB(x, y, (180 << 16) | (60 << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    val jpeg = bos.toByteArray
    assert(canDecode(jpeg), "JPEG magic must be recognized")
    val back = decode(jpeg)
    assert(back.width == 16 && back.height == 16)
    assert(math.abs(back.r(8, 8) - img.r(8, 8)) < 12 &&
      math.abs(back.g(8, 8) - img.g(8, 8)) < 12 &&
      math.abs(back.b(8, 8) - img.b(8, 8)) < 12,
      s"jpeg decode too far off: got (${back.r(8, 8)}, ${back.g(8, 8)}, ${back.b(8, 8)})")
  }

  test("RawImageKernel end-to-end on a PNG corpus: no stub, real features") {
    import spark.implicits._
    val rows = Seq(
      (0L, solid(16, 16, 240, 10, 10)), // red
      (1L, solid(8, 8, 250, 5, 5)),     // red, other size
      (2L, solid(16, 16, 10, 10, 240))  // blue
    ).map { case (id, img) =>
      Multimodal.MediaRow(id, "image", encodePng(img),
        Multimodal.MediaMeta(img.width, img.height, "png", 0))
    }
    val feats = Multimodal
      .extractFeatures(spark.createDataset(rows), Multimodal.RawImageKernel())
      .collect().map(f => f.media_id -> f.features).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(feats(0L), feats(1L)) > 0.99, "two red PNGs must match")
    assert(cos(feats(0L), feats(2L)) < 0.5, "red vs blue PNG must not match")
  }

  test("undecodable policy: error throws, stub keeps mixed corpora flowing") {
    import spark.implicits._
    val png = Multimodal.MediaRow(7L, "image", Array[Byte](0x50, 0x4e, 0x47, 0),
      Multimodal.MediaMeta(1, 1, "png", 0))
    val ds = spark.createDataset(Seq(png))
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(ds, Multimodal.RawImageKernel()).collect()
    }
    val stubbed = Multimodal.extractFeatures(ds,
      Multimodal.RawImageKernel(undecodable = "stub")).collect()
    assert(stubbed.length == 1 && stubbed.head.features.length == 64)
  }

  test("policy also covers decode FAILURES, not just unknown magic") {
    import spark.implicits._
    // right magic, broken payload: 'BM' + garbage passes canDecode but the
    // decoder throws — under "stub" the batch must still flow
    val brokenBmp = Multimodal.MediaRow(8L, "image",
      Array[Byte]('B', 'M', 1, 2, 3, 4, 5, 6, 7, 8),
      Multimodal.MediaMeta(1, 1, "bmp", 0))
    val ds = spark.createDataset(Seq(brokenBmp))
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(ds, Multimodal.RawImageKernel()).collect()
    }
    val stubbed = Multimodal.extractFeatures(ds,
      Multimodal.RawImageKernel(undecodable = "stub")).collect()
    assert(stubbed.length == 1 && stubbed.head.features.length == 64)
  }

  test("dHash: invariant under resize and monotone brightness, flips on structure") {
    // horizontal gradient: luma strictly increasing in x
    def gradient(w: Int, h: Int, reversed: Boolean): ImageCodec.RawImage = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (if (reversed) (w - 1 - x) else x) * 255 / (w - 1)
        val i = (y * w + x) * 3
        rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
      }
      ImageCodec.RawImage(w, h, rgb)
    }
    val base = gradient(90, 80, reversed = false)
    val fp = ImageCodec.dHash(base)
    // same structure at half resolution -> same hash
    assert(ImageCodec.dHash(ImageCodec.resize(base, 45, 40)) == fp)
    // darkened by 20% (monotone, order-preserving on this gradient) -> same
    val dark = ImageCodec.RawImage(base.width, base.height,
      base.rgb.map(b => ((b & 0xff) * 9 / 10).toByte))
    assert(ImageCodec.dHash(dark) == fp)
    // reversed gradient inverts every comparison -> all 64 bits differ
    val rev = ImageCodec.dHash(gradient(90, 80, reversed = true))
    assert(java.lang.Long.bitCount(fp ^ rev) == 64)
  }
}

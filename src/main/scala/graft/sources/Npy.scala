package graft.sources

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

/** Pure-JVM reader for the public NumPy `.npy` / `.npz` formats (npy format
  * spec v1.0/2.0: magic + version + header-length + Python-dict header, then
  * raw little-endian data; npz = a zip of npy members).
  *
  * Closes SURVEY §2.1 S3 for real: the reference accepts `.npz` uploads whose
  * `vectors` member is the (n, d) float matrix
  * (api/routes/batch_v1.py:406-410) — with this parser those files ingest
  * directly, no out-of-band conversion step.
  *
  * Scope: C-order arrays of `<f4 <f8 <i4 <i8` (the dtypes embedding dumps
  * use). Fortran order and other dtypes raise with a clear message.
  */
object Npy {

  /** One parsed npy array: element type descriptor, shape, raw LE data. */
  final case class NpyArray(descr: String, shape: Seq[Int], data: Array[Byte]) {

    private def elemSize: Int = descr match {
      case "<f4" | "<i4" => 4
      case "<f8" | "<i8" => 8
      case other => throw new IllegalArgumentException(
        s"unsupported npy dtype '$other' (supported: <f4 <f8 <i4 <i8)")
    }

    private def buf: ByteBuffer =
      ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)

    private def readElemAsDouble(b: ByteBuffer): Double = descr match {
      case "<f4" => b.getFloat.toDouble
      case "<f8" => b.getDouble
      case "<i4" => b.getInt.toDouble
      case "<i8" => b.getLong.toDouble
    }

    /** (n, d) matrix as float rows (the store's vector element type). */
    def toFloatMatrix: Array[Array[Float]] = {
      require(shape.length == 2, s"expected a 2-d array, got shape $shape")
      val Seq(n, d) = shape
      require(data.length == n.toLong * d * elemSize,
        s"npy payload ${data.length}B != $n*$d*${elemSize}B")
      val b = buf
      Array.fill(n)(Array.fill(d)(readElemAsDouble(b).toFloat))
    }

    /** 1-d array as longs (id lists). */
    def toLongVector: Array[Long] = {
      require(shape.length == 1, s"expected a 1-d array, got shape $shape")
      val b = buf
      descr match {
        case "<i8" => Array.fill(shape.head)(b.getLong)
        case "<i4" => Array.fill(shape.head)(b.getInt.toLong)
        case other => throw new IllegalArgumentException(
          s"expected an integer array for ids, got '$other'")
      }
    }
  }

  private val Magic: Array[Byte] =
    Array(0x93.toByte) ++ "NUMPY".getBytes(StandardCharsets.US_ASCII)

  /** Parse one `.npy` byte payload. */
  def parseNpy(bytes: Array[Byte]): NpyArray = {
    require(bytes.length > 10 && bytes.take(6).sameElements(Magic),
      "not an npy file (bad magic)")
    val major = bytes(6) & 0xff
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // v1: u16 header len at offset 8 (10-byte prelude); v2+: u32 (12-byte)
    val (headerLen, headerStart) =
      if (major == 1) ((b.getShort(8) & 0xffff), 10)
      else (b.getInt(8), 12)
    val header = new String(bytes, headerStart, headerLen, StandardCharsets.US_ASCII)

    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"npy header missing descr: $header"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(header)
      .map(_.group(1) == "True")
      .getOrElse(throw new IllegalArgumentException(s"npy header missing fortran_order: $header"))
    require(!fortran, "fortran-order npy arrays are not supported (save in C order)")
    val shape = "'shape'\\s*:\\s*\\(([0-9,\\s]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(throw new IllegalArgumentException(s"npy header missing shape: $header"))

    NpyArray(descr, shape, bytes.drop(headerStart + headerLen))
  }

  /** Parse an `.npz` (zip of npy members); keys are member names sans `.npy`. */
  def parseNpz(bytes: Array[Byte]): Map[String, NpyArray] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, NpyArray]
    var entry = zin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory && entry.getName.endsWith(".npy")) {
        val name = entry.getName.stripSuffix(".npy")
        out += name -> parseNpy(zin.readAllBytes())
      }
      entry = zin.getNextEntry
    }
    zin.close()
    out.result()
  }
}

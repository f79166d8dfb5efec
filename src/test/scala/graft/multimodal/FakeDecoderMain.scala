package graft.multimodal

/** A stand-in external decoder implementing [[SubprocessDecodeKernel]]'s
  * wire contract, launched by the spec as a REAL subprocess
  * (`java -cp <test classpath> graft.multimodal.FakeDecoderMain ...`) so
  * the framing, pipe-threading, timeout and failure paths are exercised
  * against an actual OS process rather than a mock.
  *
  * Features are a deterministic function of the media bytes (a 31-fold
  * hash), so the spec can compute the expected vectors driver-side.
  *
  * Failure-injection flags:
  *  - `--fail-row I`    answer row I with status 7 (row-level failure)
  *  - `--crash-after N` exit 3 after answering N rows (process failure)
  *  - `--hang`          never answer (exercises the batch deadline)
  *  - `--garbage`       truncate the first row's vector (framing failure)
  */
object FakeDecoderMain {
  def hashOf(bytes: Array[Byte]): Long =
    bytes.foldLeft(1125899906842597L)((a, b) => 31 * a + b)

  def featureOf(bytes: Array[Byte], dim: Int): Array[Float] = {
    val s = hashOf(bytes)
    Array.tabulate(dim)(j => (math.floorMod(s + j, 1000L)) / 1000.0f)
  }

  def main(args: Array[String]): Unit = {
    def intFlag(name: String): Option[Int] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v.toInt }
    val dim = intFlag("--dim").getOrElse(4)
    val failRow = intFlag("--fail-row")
    val crashAfter = intFlag("--crash-after")
    val hang = args.contains("--hang")
    val garbage = args.contains("--garbage")

    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(System.in))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(System.out))
    var idx = 0
    try {
      while (true) {
        val n = in.readInt()
        val buf = new Array[Byte](n)
        in.readFully(buf)
        if (hang) Thread.sleep(600000L)
        if (crashAfter.exists(idx >= _)) {
          out.flush()
          System.err.println(s"fake decoder: crashing at row $idx")
          sys.exit(3)
        }
        if (failRow.contains(idx)) {
          out.writeInt(7)
        } else {
          out.writeInt(0)
          val v = featureOf(buf, dim)
          if (garbage && idx == 0) {
            out.writeFloat(v(0)) // truncated vector, then quit
            out.flush()
            sys.exit(0)
          }
          v.foreach(out.writeFloat)
        }
        idx += 1
      }
    } catch {
      case _: java.io.EOFException => () // end of batch
    }
    out.flush()
    sys.exit(0)
  }
}

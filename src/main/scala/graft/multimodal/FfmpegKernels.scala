package graft.multimodal

import graft.multimodal.Multimodal.DecodeKernel

/** Real compressed-media decoders behind [[SubprocessDecodeKernel]]'s wire
  * contract: an ffmpeg-backed adapter script (shipped as a classpath
  * resource, materialized to a per-JVM temp file) turns MP3/AAC/OGG audio
  * into time-bucket RMS features and H.264/MP4/MKV video into a
  * first-keyframe 64-bit dHash — the two compressed families the JVM
  * cannot decode ([[Multimodal]]'s documented limitation, now an adapter
  * away instead of a stub).
  *
  * The adapter is one process per batch speaking the length-prefixed
  * framing; ffmpeg runs once per row inside it. A missing/broken ffmpeg
  * binary is a PROCESS failure (the script exits nonzero before answering
  * any row), so under `onFailure="fallback"` the whole batch lands on the
  * in-JVM fallback kernel and a 100 TB job keeps flowing on machines
  * without ffmpeg — FfmpegKernelsSpec drives exactly that path, binary
  * present or not.
  */
object FfmpegKernels {

  private val ScriptResource = "/graft/multimodal/ffmpeg_decode.py"

  /** Materialize the adapter script once per JVM (executors each do this
    * lazily on first use — the kernel is serialized by command line, not
    * by script content).
    */
  lazy val scriptPath: String = {
    val in = getClass.getResourceAsStream(ScriptResource)
    require(in != null, s"missing classpath resource $ScriptResource")
    val tmp = java.nio.file.Files.createTempFile("graft_ffmpeg_decode", ".py")
    try java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  /** Is an ffmpeg binary runnable on THIS machine? (Integration specs use
    * it to skip cleanly; production jobs should prefer `onFailure =
    * "fallback"` over a pre-flight check — the fleet is rarely uniform.)
    */
  def available(binary: String = "ffmpeg"): Boolean =
    try {
      val p = new ProcessBuilder(binary, "-version")
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** The cluster-safe wrapper: the adapter script's temp-file path is a
    * PER-JVM fact (a driver's /tmp does not exist on a 1000-executor
    * cluster), so the inner [[SubprocessDecodeKernel]] — whose command
    * embeds that path — must be built lazily AFTER deserialization on
    * whichever JVM runs the batch. `@transient lazy` does exactly that;
    * everything serialized is plain config.
    */
  case class FfmpegKernel(
      mode: String,
      dim: Int,
      rate: Int,
      binary: String,
      onFailure: String,
      fallback: Option[DecodeKernel],
      timeoutMs: Long) extends DecodeKernel {
    require(Seq("audio", "video").contains(mode), s"bad mode $mode")
    // mirror the inner SubprocessDecodeKernel's policy requires: the inner
    // kernel is built lazily on the EXECUTOR (the per-JVM script path), so
    // without these a misconfigured kernel would only fail at the first
    // decodeBatch mid-job instead of at driver-side construction
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(Seq("error", "fallback").contains(onFailure),
      s"onFailure policy must be error|fallback, got $onFailure")
    require(onFailure != "fallback" || fallback.exists(_.dim == dim),
      s"onFailure=fallback needs a fallback kernel of the same dim=$dim")
    require(timeoutMs >= 1, s"timeoutMs must be >= 1, got $timeoutMs")

    @transient private lazy val inner: SubprocessDecodeKernel =
      SubprocessDecodeKernel(
        Seq("python3", scriptPath, "--mode", mode, "--dim", dim.toString,
          "--rate", rate.toString, "--ffmpeg", binary),
        dim, onFailure, fallback, timeoutMs)

    override def decodeBatch(batch: Seq[Multimodal.MediaRow]): Seq[Array[Float]] =
      inner.decodeBatch(batch)
  }

  /** Compressed-audio feature kernel: any container ffmpeg reads -> mono
    * float32 PCM at `rate` Hz -> `dim` time-bucket RMS energies,
    * L2-normalized (deterministic — no model in the loop).
    */
  def audioFeatures(
      dim: Int = 64,
      rate: Int = 16000,
      binary: String = "ffmpeg",
      onFailure: String = "error",
      fallback: Option[DecodeKernel] = None,
      timeoutMs: Long = 60000L): DecodeKernel =
    FfmpegKernel("audio", dim, rate, binary, onFailure, fallback, timeoutMs)

  /** Compressed-video keyframe kernel: first keyframe (H.264/MP4/MKV/...)
    * scaled to the dHash geometry, emitted as 64 {0,1} floats — feed it to
    * [[graft.operators.HammingIndex]] after packing bits, or use the float
    * vector directly.
    */
  def videoKeyframeDHash(
      binary: String = "ffmpeg",
      onFailure: String = "error",
      fallback: Option[DecodeKernel] = None,
      timeoutMs: Long = 60000L): DecodeKernel =
    FfmpegKernel("video", 64, 16000, binary, onFailure, fallback, timeoutMs)
}

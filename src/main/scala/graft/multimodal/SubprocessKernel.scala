package graft.multimodal

import graft.multimodal.Multimodal.{DecodeKernel, MediaRow}

import java.io.{DataInputStream, DataOutputStream, EOFException}

/** Out-of-JVM decode kernel: ships each batch to an EXTERNAL decoder
  * process over a length-prefixed stdin/stdout contract — the seam that
  * lets compressed media (MP3/AAC audio, H.264/MP4/MKV video), which the
  * JVM cannot decode ([[Multimodal]]'s documented limitation), run through
  * a real codec stack (an ffmpeg-based filter, a GPU inference server's
  * CLI shim) without any Spark-side plumbing change: this is just another
  * [[Multimodal.DecodeKernel]], so `extractFeatures` batches, partitions
  * and schemas stay identical.
  *
  * ## Wire contract (one process per batch, filter-style)
  *
  * Request (the kernel writes the process's stdin, then closes it):
  *  - per row, in batch order: `int32 BE length` + that many media bytes.
  *
  * Response (the process writes stdout):
  *  - per row, in the same order: `int32 BE status`;
  *    status 0 = decoded, followed by exactly `dim` `float32 BE` features;
  *    status != 0 = this row failed (nothing follows for the row).
  *  - process exits 0 after the last row; any other exit is a process
  *    failure even if all rows were answered.
  *
  * Big-endian framing matches `java.io.Data{Input,Output}Stream` on this
  * side and `struct.pack('>if', ...)`-style code on the decoder side.
  *
  * ## Failure semantics (documented contract, spec-asserted)
  *
  * Failures are isolated AT BATCH GRANULARITY — one wedged or crashing
  * decoder invocation must not kill a 100 TB job:
  *  - PROCESS failures (spawn error, nonzero exit, truncated/garbled
  *    framing, batch deadline `timeoutMs` exceeded — the process is
  *    destroyed on timeout): under `onFailure="fallback"` the entire batch
  *    re-runs through the in-JVM `fallback` kernel (JVM codecs or the
  *    deterministic stub); under `onFailure="error"` the job fails with
  *    the process's captured stderr (tail-capped) in the message.
  *  - ROW failures (status != 0 with the process otherwise healthy):
  *    scoped to the row — fallback kernel for that row under "fallback",
  *    error naming the media_id under "error".
  * stderr is drained concurrently (capped buffer) so a chatty decoder
  * cannot deadlock the pipe; stdin is written from a separate thread so a
  * decoder that answers before consuming everything cannot either.
  */
case class SubprocessDecodeKernel(
    command: Seq[String],
    dim: Int,
    onFailure: String = "error",
    fallback: Option[DecodeKernel] = None,
    timeoutMs: Long = 60000L,
    maxStderrBytes: Int = 8192) extends DecodeKernel {

  require(command.nonEmpty, "decoder command must be non-empty")
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(Seq("error", "fallback").contains(onFailure),
    s"onFailure policy must be error|fallback, got $onFailure")
  require(onFailure != "fallback" || fallback.exists(_.dim == dim),
    s"onFailure=fallback needs a fallback kernel of the same dim=$dim")
  require(timeoutMs >= 1, s"timeoutMs must be >= 1, got $timeoutMs")

  override def decodeBatch(batch: Seq[MediaRow]): Seq[Array[Float]] = {
    if (batch.isEmpty) return Seq.empty
    try runBatch(batch)
    catch {
      case e: Exception if onFailure == "fallback" =>
        // batch-level isolation: the whole batch re-runs in-JVM
        fallback.get.decodeBatch(batch)
    }
  }

  private def runBatch(batch: Seq[MediaRow]): Seq[Array[Float]] = {
    val pb = new ProcessBuilder(command: _*)
    val proc =
      try pb.start()
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"decoder spawn failed for '${command.head}': ${e.getMessage}", e)
      }
    val stderr = new java.io.ByteArrayOutputStream()
    val stderrThread = new Thread(() => {
      val buf = new Array[Byte](4096)
      val in = proc.getErrorStream
      try {
        var n = in.read(buf)
        while (n >= 0) {
          val room = maxStderrBytes - stderr.size()
          if (room > 0) stderr.write(buf, 0, math.min(n, room))
          n = in.read(buf)
        }
      } catch { case _: java.io.IOException => () }
    }, "graft-decoder-stderr")
    stderrThread.setDaemon(true)
    stderrThread.start()

    // writer thread: a decoder may emit output before consuming all input;
    // writing from the reading thread could deadlock on full pipes
    @volatile var writeError: Option[Throwable] = None
    val stdinThread = new Thread(() => {
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(proc.getOutputStream))
      try {
        batch.foreach { row =>
          out.writeInt(row.bytes.length)
          out.write(row.bytes)
        }
        out.close()
      } catch {
        // a crashed decoder closes the pipe mid-write; the read side
        // reports the real failure with stderr context
        case e: java.io.IOException => writeError = Some(e)
      }
    }, "graft-decoder-stdin")
    stdinThread.setDaemon(true)
    stdinThread.start()

    // batch deadline: destroy the process so the reads below unblock
    @volatile var timedOut = false
    val watchdog = new java.util.Timer("graft-decoder-watchdog", true)
    watchdog.schedule(new java.util.TimerTask {
      override def run(): Unit = { timedOut = true; proc.destroyForcibly(); () }
    }, timeoutMs)

    def fail(what: String): Nothing = {
      proc.destroyForcibly()
      // let the drain thread finish flushing the (already-capped) buffer so
      // the error message carries the decoder's last words
      stderrThread.join(2000)
      val err = stderr.toString("UTF-8").trim
      val cause = if (timedOut) s"timed out after ${timeoutMs}ms" else what
      throw new IllegalStateException(
        s"decoder '${command.head}' $cause" +
          (if (err.nonEmpty) s"; stderr: $err" else ""))
    }

    try {
      val in = new DataInputStream(
        new java.io.BufferedInputStream(proc.getInputStream))
      val out = batch.map { row =>
        val status =
          try in.readInt()
          catch { case _: EOFException | _: java.io.IOException =>
            fail(s"stream ended before answering media ${row.media_id}") }
        if (status == 0) {
          val v = new Array[Float](dim)
          try { var j = 0; while (j < dim) { v(j) = in.readFloat(); j += 1 } }
          catch { case _: EOFException | _: java.io.IOException =>
            fail(s"truncated feature vector for media ${row.media_id}") }
          Right(v): Either[Int, Array[Float]]
        } else Left(status)
      }
      if (!proc.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
        fail("did not exit after answering the batch")
      if (proc.exitValue() != 0) fail(s"exited ${proc.exitValue()}")
      stderrThread.join(1000)
      // row-level failures: scoped to the row, the process stayed healthy
      batch.zip(out).map {
        case (_, Right(v)) => v
        case (row, Left(status)) =>
          if (onFailure == "fallback") fallback.get.decodeBatch(Seq(row)).head
          else throw new IllegalArgumentException(
            s"media ${row.media_id}: decoder reported row status $status" + {
              val err = stderr.toString("UTF-8").trim
              if (err.nonEmpty) s"; stderr: $err" else ""
            })
      }
    } finally {
      watchdog.cancel()
      proc.destroyForcibly()
      ()
    }
  }
}

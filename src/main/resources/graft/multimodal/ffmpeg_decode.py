# ffmpeg adapter for graft.multimodal.SubprocessDecodeKernel.
#
# Speaks the kernel's length-prefixed wire contract on stdin/stdout
# (int32-BE length + blob per row in; int32-BE status [+ dim float32-BE
# features] per row out; exit 0 after the last row) and delegates the
# actual decode to an ffmpeg binary. One process handles one batch
# (filter-style), matching SubprocessDecodeKernel's process-per-batch
# lifecycle.
#
# Modes:
#   audio: blob -> ffmpeg -> mono float32 PCM at --rate Hz -> --dim
#          time-bucket RMS energies, L2-normalized. Any container/codec
#          ffmpeg can read (MP3, AAC, OGG, WAV, ...).
#   video: blob -> ffmpeg keyframe select -> first keyframe as 9x8 gray ->
#          64-bit dHash as 64 {0,1} floats (--dim must be 64). Any
#          container/codec ffmpeg can read (H.264/MP4, MKV, ...).
#
# Failure contract: a row ffmpeg cannot decode gets status 1 (row-scoped;
# the kernel's onFailure policy decides). A missing/broken ffmpeg binary
# is a PROCESS failure: exit nonzero before answering, so the kernel
# re-runs the batch on its in-JVM fallback (or errors, per policy).
import argparse
import struct
import subprocess
import sys


def read_exact(stream, n):
    buf = b""
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            raise EOFError("stdin ended mid-row")
        buf += chunk
    return buf


def run_ffmpeg(binary, blob, out_args):
    # stdin-pipe the blob; demuxers that need seekable input are out of
    # scope for a filter kernel (remux upstream if you hit one)
    proc = subprocess.run(
        [binary, "-hide_banner", "-loglevel", "error", "-i", "pipe:0"]
        + out_args + ["pipe:1"],
        input=blob, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    if proc.returncode != 0:
        raise ValueError(proc.stderr.decode("utf-8", "replace")[-500:])
    return proc.stdout


def audio_features(binary, blob, dim, rate):
    pcm = run_ffmpeg(binary, blob,
                     ["-f", "f32le", "-ac", "1", "-ar", str(rate)])
    n = len(pcm) // 4
    if n == 0:
        raise ValueError("no audio samples decoded")
    samples = struct.unpack("<%df" % n, pcm[: n * 4])
    feats = []
    for b in range(dim):
        lo = b * n // dim
        hi = max((b + 1) * n // dim, lo + 1) if lo < n else n
        seg = samples[lo:hi] if lo < n else (0.0,)
        feats.append((sum(x * x for x in seg) / len(seg)) ** 0.5)
    norm = (sum(x * x for x in feats)) ** 0.5
    if norm > 1e-12:
        feats = [x / norm for x in feats]
    return feats


def video_dhash(binary, blob):
    # first keyframe, scaled to the dHash geometry (9 wide x 8 tall, gray)
    gray = run_ffmpeg(binary, blob,
                      ["-vf", "select=eq(pict_type\\,I),scale=9:8",
                       "-frames:v", "1", "-f", "rawvideo", "-pix_fmt", "gray"])
    if len(gray) < 72:
        raise ValueError("no keyframe decoded")
    px = gray[:72]
    return [1.0 if px[r * 9 + c + 1] > px[r * 9 + c] else 0.0
            for r in range(8) for c in range(8)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["audio", "video"], required=True)
    ap.add_argument("--dim", type=int, required=True)
    ap.add_argument("--rate", type=int, default=16000)
    ap.add_argument("--ffmpeg", default="ffmpeg")
    args = ap.parse_args()
    if args.mode == "video" and args.dim != 64:
        sys.stderr.write("video mode emits a 64-bit dHash; --dim must be 64\n")
        return 2

    # PROCESS failure, not row failures, when the binary itself is absent
    try:
        subprocess.run([args.ffmpeg, "-version"], stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL, check=True)
    except (OSError, subprocess.CalledProcessError):
        sys.stderr.write("ffmpeg binary not runnable: %s\n" % args.ffmpeg)
        return 3

    stdin, stdout = sys.stdin.buffer, sys.stdout.buffer
    while True:
        hdr = stdin.read(4)
        if not hdr:
            break  # clean end of batch
        if len(hdr) < 4:
            sys.stderr.write("truncated length prefix\n")
            return 4
        blob = read_exact(stdin, struct.unpack(">i", hdr)[0])
        try:
            feats = (audio_features(args.ffmpeg, blob, args.dim, args.rate)
                     if args.mode == "audio" else video_dhash(args.ffmpeg, blob))
            stdout.write(struct.pack(">i", 0))
            stdout.write(struct.pack(">%df" % args.dim, *feats))
        except Exception as e:
            sys.stderr.write("row decode failed: %s\n" % e)
            stdout.write(struct.pack(">i", 1))
        stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())

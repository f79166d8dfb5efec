#!/usr/bin/env python3
"""Round-over-round bench comparison UNDER THE NOISE FLOOR.

Usage: python3 tools/bench_diff.py OLD_BENCH.json NEW_BENCH.json [--top N]

Reads two Bench JSON lines (BENCH_LOCAL.json files or the {"metric":...}
line inside a BENCH_r*.json's "tail"), joins per-query timings, and
separates SIGNAL from WEATHER using the new line's per-run noise object:
a delta is only reported as signal when |delta| exceeds both the p90
relative spread of the measuring run and an absolute floor (50 ms —
scheduler jitter on sub-second queries). Everything else is aggregate
drift, summarized once.

This is the arbitration step the r13 verdict asked for: with identical
code measuring +/-15% between snapshots, eyeballing per-query deltas
finds phantoms; this tool only surfaces deltas the run's own measured
variance cannot explain.

Caveat the surviving signal still carries: the noise object measures
WITHIN-run spread; BETWEEN-run drift on sub-second queries runs higher
(two identical-code r14 runs disagreed by 45-75% on a handful of
sub-0.5s queries). Before believing a flagged sub-second delta, check
whether the query's code was touched at all — and if it matters, rerun.
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    # accept either a bare bench line or a BENCH_r*.json wrapper whose
    # "tail" holds (a possibly beheaded copy of) the line
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        raise SystemExit(f"{path}: not JSON")
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    start = tail.find('{"metric"')
    if start >= 0:
        try:
            return json.loads(tail[start:])
        except json.JSONDecodeError:
            pass
    raise SystemExit(f"{path}: no full bench line (beheaded tail?) — "
                     "use the repo's BENCH_LOCAL.json instead")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    noise = new.get("noise", {})
    p90 = noise.get("p90_rel_spread_pct", 30.0) / 100.0
    floor_s = 0.05

    print(f"common {len(common)} queries: "
          f"{sum(oq[k] for k in common):.1f}s -> "
          f"{sum(nq[k] for k in common):.1f}s; "
          f"noise floor p90={p90 * 100:.1f}% (abs {floor_s * 1000:.0f}ms)")
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    signal = []
    weather_total = 0.0
    for k in common:
        d = nq[k] - oq[k]
        base = max(oq[k], 1e-9)
        if abs(d) > max(p90 * base, floor_s):
            signal.append((d, k))
        else:
            weather_total += d
    signal.sort()
    print(f"\nweather (inside noise): {len(common) - len(signal)} queries, "
          f"net {weather_total:+.1f}s")
    if not signal:
        print("signal: none — every per-query delta is inside the "
              "measuring run's own variance")
        return
    print(f"signal ({len(signal)} queries outside the floor):")
    for d, k in (signal[:top] if len(signal) > top else signal):
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({d:+.2f}s, "
              f"{d / max(oq[k], 1e-9) * 100:+.0f}%)")
    if len(signal) > top:
        print(f"  ... and {len(signal) - top} more (--top=N)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Round-over-round bench comparison UNDER THE NOISE FLOOR.

Usage: python3 tools/bench_diff.py OLD_BENCH.json NEW_BENCH.json [--top N]

Reads two Bench JSON lines (BENCH_LOCAL.json files or the {"metric":...}
line inside a BENCH_r*.json's "tail"), joins per-query timings, and
separates SIGNAL from WEATHER.

Arbitration, strongest evidence first:
 1. TWO-SAMPLE SEPARATION — when BOTH lines carry per-query "runs"
    arrays (r15+ Bench persists them), a delta is signal only when the
    run-sets separate: min(new runs) > max(old runs), or vice versa.
    This is the non-parametric extreme-rank criterion (equivalent to a
    rank-sum test at its most conservative cut): if the slowest run of
    one line is still faster than the fastest run of the other, no
    overlap exists and the delta cannot be within-noise.
 2. NOISE-FLOOR FALLBACK — when either line predates run persistence, a
    delta is signal when |delta| exceeds both the measuring run's p90
    relative spread and an absolute floor (50 ms — scheduler jitter on
    sub-second queries). This inherits the r14 caveat: the noise object
    measures WITHIN-run spread, and between-run drift on sub-second
    queries runs higher (two identical-code r14 runs disagreed by
    45-75% on a handful of sub-0.5s queries), so check whether a
    flagged sub-second query's code was touched at all before believing
    the delta.
Both criteria also require the absolute floor, so a 3 ms "separation"
on a 40 ms query never surfaces.
"""
import argparse
import json
import statistics


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
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("old_bench")
    ap.add_argument("new_bench")
    ap.add_argument("--top", type=int, default=10,
                    help="max signal rows to print (default 10)")
    ns = ap.parse_args()
    old, new = load(ns.old_bench), load(ns.new_bench)
    oq, nq = old["queries"], new["queries"]
    oruns, nruns = old.get("runs", {}), new.get("runs", {})
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    noise = new.get("noise", {})
    p90 = noise.get("p90_rel_spread_pct", 30.0) / 100.0
    floor_s = 0.05
    two_sample = sum(1 for k in common if oruns.get(k) and nruns.get(k))

    print(f"common {len(common)} queries: "
          f"{sum(oq[k] for k in common):.1f}s -> "
          f"{sum(nq[k] for k in common):.1f}s; "
          f"two-sample on {two_sample}, noise-floor "
          f"p90={p90 * 100:.1f}% (abs {floor_s * 1000:.0f}ms) on the rest")
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    # FLEET DRIFT: with 2-3 samples per query, between-run machine-state
    # drift is CORRELATED across queries — a uniformly-faster second run
    # "separates" dozens of same-code queries in one direction (measured:
    # 70/157 separated, all improvements, on an identical-code rerun).
    # The median relative delta estimates that shared shift; a separated
    # delta whose direction matches it and whose magnitude is within 3x
    # of it is annotated ~fleet (the code-diff check still decides).
    rel = sorted((nq[k] - oq[k]) / max(oq[k], 1e-9) for k in common)
    # true median (interpolated on even counts — the upper-element pick
    # biased the annotation direction on an even query count)
    fleet = statistics.median(rel) if rel else 0.0
    print(f"fleet drift (median rel delta): {fleet * 100:+.1f}%")

    signal = []
    weather_total = 0.0
    for k in common:
        d = nq[k] - oq[k]
        o_r, n_r = oruns.get(k), nruns.get(k)
        if o_r and n_r:
            separated = min(n_r) > max(o_r) or max(n_r) < min(o_r)
            is_signal = separated and abs(d) > floor_s
            how = "sep"
        else:
            base = max(oq[k], 1e-9)
            is_signal = abs(d) > max(p90 * base, floor_s)
            how = "floor"
        if is_signal:
            r = d / max(oq[k], 1e-9)
            # epsilon guard: a near-zero fleet estimate would make the
            # 3x band degenerate (any same-direction delta "matches")
            if abs(fleet) > 0.005 and r * fleet > 0 and abs(r) <= 3 * abs(fleet):
                how += "~fleet"
            signal.append((d, k, how))
        else:
            weather_total += d
    signal.sort()
    print(f"\nweather (inside noise): {len(common) - len(signal)} queries, "
          f"net {weather_total:+.1f}s")
    if not signal:
        print("signal: none — every per-query delta is inside the "
              "measuring run's own variance")
        return
    n_fleet = sum(1 for _, _, how in signal if how.endswith("~fleet"))
    print(f"signal ({len(signal)} queries outside the floor; "
          f"{n_fleet} of them consistent with the fleet shift):")
    for d, k, how in (signal[:ns.top] if len(signal) > ns.top else signal):
        runs_note = ""
        if how.startswith("sep"):
            runs_note = (f"  old_runs={[round(v, 2) for v in oruns[k]]}"
                         f" new_runs={[round(v, 2) for v in nruns[k]]}")
        print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s ({d:+.2f}s, "
              f"{d / max(oq[k], 1e-9) * 100:+.0f}%, {how}){runs_note}")
    if len(signal) > ns.top:
        print(f"  ... and {len(signal) - ns.top} more (--top N)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare a graft.Bench per-query map against a committed baseline pin.

Usage:
  python3 tools/check_regressions.py <bench_queries.json> [pin.json] [ratio]

Defaults: pin = baseline_pin_local32.json, ratio = 2.0 (the project's
performance gate). Exit code 1 if any query's median exceeds ratio x its
pinned median, if a pinned query is missing from the bench output
(dropped/renamed queries must not silently shrink the gate), or if the
bench artifact's sf/cpus do not match the pin's (cross-config comparison
is meaningless). Queries absent from the pin (newly added) are listed
informationally. A median far above the SAME run's min is flagged as
likely ambient contention rather than a code regression — reproduce
before chasing it.

Host-drift normalization: when both artifacts carry a "calib" field (the
bench's fixed in-memory probe, graft.Bench.calibrate — testdata-free, so
it moves only with machine speed), the gate divides every query ratio by
host = bench_calib / pin_calib before comparing against the threshold.
Two rounds of uniform host drift (0.97x -> 1.24x with zero workload
regressions) showed why: un-normalized, a 1.5x-slower machine fakes
regressions across the whole catalog, and a faster one masks real ones.
Raw ratios are still printed next to the normalized ones. Without calib
on both sides the gate falls back to raw ratios (host = 1).
"""
import json
import sys

def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_queries.json"
    pin_path = sys.argv[2] if len(sys.argv) > 2 else "baseline_pin_local32.json"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    bench = json.load(open(bench_path))
    pin = json.load(open(pin_path))
    bq, pq = bench["queries"], pin["queries"]
    mins = bench.get("query_mins", {})
    # A bench run at a different scale factor or core count compared
    # against this pin produces meaningless OVER/under results.
    mismatched = [k for k in ("sf", "cpus")
                  if k in bench and k in pin and bench[k] != pin[k]]
    if mismatched:
        for k in mismatched:
            print(f"ERROR: bench {k}={bench[k]} != pin {k}={pin[k]} — "
                  f"artifact and pin are not comparable")
        return 1
    # Calibration-normalized gating: host > 1 means this machine is slower
    # than the one that recorded the pin; dividing ratios by it keeps the
    # gate anchored to workload changes. A wildly shifted probe (>3x either
    # way) more likely signals a broken probe or a misconfigured session
    # than a credible host change — warn and fall back to raw.
    bcal, pcal = bench.get("calib"), pin.get("calib")
    host = 1.0
    if bcal and pcal and bcal > 0 and pcal > 0:
        host = bcal / pcal
        if not (1 / 3 <= host <= 3):
            print(f"WARNING: calib shift {host:.2f}x (bench {bcal:.3f}s vs "
                  f"pin {pcal:.3f}s) outside plausible host drift — "
                  f"gating on RAW ratios; investigate the probe")
            host = 1.0
        else:
            print(f"host calibration: bench {bcal:.3f}s vs pin {pcal:.3f}s "
                  f"-> normalizing query ratios by {host:.2f}x")
    else:
        print("no calib field on both artifacts — gating on raw ratios")
    # IO-sensitive probe (round 16): printed and adjudicated alongside the
    # CPU probe. Disk contention hits the RocksDB-backed streaming family
    # without moving the CPU probe (the round-15 blind spot), so an
    # elevated IO probe marks the run's OVER flags as contention-suspect
    # even when the CPU probe looks quiet. It does NOT normalize ratios —
    # IO load does not scale the whole catalog uniformly the way host
    # speed does; it gates trust in the artifact instead.
    bio, pio = bench.get("calib_io"), pin.get("calib_io")
    io_contended = False
    if bio and pio and bio > 0 and pio > 0:
        io_ratio = bio / pio
        io_contended = io_ratio > 2.0
        tag = " — IO-CONTENDED: treat OVER flags as suspect" if io_contended else ""
        print(f"io probe: bench {bio:.3f}s vs pin {pio:.3f}s "
              f"({io_ratio:.2f}x){tag}")
    elif bio or pio:
        print("io probe on one artifact only — re-pin to enable the IO guard")
    if bench.get("contended"):
        print("NOTE: artifact self-marked contended (probe retry never "
              "settled) — bench diverted this map away from the gate input")
    regressions, new = [], []
    # A pinned query absent from the bench map means it was dropped,
    # renamed, or failed before entering the selected set — that loss must
    # not silently shrink the gate to the overlap.
    missing = sorted(set(pq) - set(bq))
    for name, med in sorted(bq.items()):
        if med < 0:
            regressions.append((name, med, pq.get(name, -1), "FAILED"))
            continue
        if name not in pq or pq[name] <= 0:
            new.append((name, med))
            continue
        if med / host > ratio * pq[name]:
            mn = mins.get(name)
            note = ("median %.2fx its own min -> likely contention, reproduce"
                    % (med / mn) if mn and mn > 0 and med > 1.5 * mn
                    else "reproducible? investigate")
            note = (f"raw {med / pq[name]:.2f}x, normalized "
                    f"{med / host / pq[name]:.2f}x — " + note)
            regressions.append((name, med, pq[name], note))
    total = sum(v for v in bq.values() if v >= 0)
    # exclude FAILED queries (bench median -1) from the pinned side too:
    # total already excludes their runtimes, so including their pins
    # would bias the printed ratio low exactly when queries fail
    pinned_total = sum(v for k, v in pq.items()
                       if bq.get(k, -1) >= 0 and v > 0)
    if pinned_total:
        print(f"total {total:.2f}s vs pinned subset {pinned_total:.2f}s "
              f"(raw {total / pinned_total:.2f}x, normalized "
              f"{total / host / pinned_total:.2f}x)")
    else:
        print("no pinned overlap")
    for name, med in new:
        print(f"  NEW   {name:28s} {med:6.3f}s (no pin)")
    for name in missing:
        print(f"  MISSING {name:26s} pinned {pq[name]:6.3f}s but absent "
              f"from bench output — dropped, renamed, or failed pre-run")
    for name, med, p, note in regressions:
        print(f"  OVER  {name:28s} {med:6.3f}s vs pin {p:6.3f}s — {note}")
    if not regressions and not missing:
        print(f"OK: no query exceeds {ratio}x its pin (calib-normalized)"
              if host != 1.0 else f"OK: no query exceeds {ratio}x its pin")
    return 1 if regressions or missing else 0

if __name__ == "__main__":
    sys.exit(main())

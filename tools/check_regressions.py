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
        if med > ratio * pq[name]:
            mn = mins.get(name)
            note = ("median %.2fx its own min -> likely contention, reproduce"
                    % (med / mn) if mn and mn > 0 and med > 1.5 * mn
                    else "reproducible? investigate")
            regressions.append((name, med, pq[name], note))
    total = sum(v for v in bq.values() if v >= 0)
    pinned_total = sum(v for k, v in pq.items() if k in bq and v > 0)
    print(f"total {total:.2f}s vs pinned subset {pinned_total:.2f}s "
          f"({total / pinned_total:.2f}x)" if pinned_total else "no pinned overlap")
    for name, med in new:
        print(f"  NEW   {name:28s} {med:6.3f}s (no pin)")
    for name in missing:
        print(f"  MISSING {name:26s} pinned {pq[name]:6.3f}s but absent "
              f"from bench output — dropped, renamed, or failed pre-run")
    for name, med, p, note in regressions:
        print(f"  OVER  {name:28s} {med:6.3f}s vs pin {p:6.3f}s — {note}")
    if not regressions and not missing:
        print(f"OK: no query exceeds {ratio}x its pin")
    return 1 if regressions or missing else 0

if __name__ == "__main__":
    sys.exit(main())

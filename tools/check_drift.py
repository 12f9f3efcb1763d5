#!/usr/bin/env python3
"""Round-over-round bench drift gate.

Compares two bench artifacts (the compact JSON line Bench.scala emits,
or the /tmp/bench_full.json per-query form) on their SHARED keys:

    python3 tools/check_drift.py BENCH_LOCAL_r07.json BENCH_LOCAL_r09.json

Fails loudly (exit 1) when any shared key's warm median grew more than
RATIO_MAX (default 1.2) versus the baseline, unless the key is under
the noise floor (NOISE_S, default 0.3 s — sub-300 ms queries swing
2x from GC/scheduling alone and carry no signal). Improvements and
new keys are reported but never fail the gate.
"""
import json
import sys

RATIO_MAX = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
NOISE_S = 0.3


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver artifacts wrap the parsed line under "parsed"
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main():
    base, cur = load(sys.argv[1]), load(sys.argv[2])
    bq, cq = base["queries"], cur["queries"]
    shared = sorted(set(bq) & set(cq))
    if not shared:
        print("DRIFT GATE ERROR: no shared keys between artifacts")
        return 1
    regressions, improved = [], []
    for k in shared:
        b, c = bq[k], cq[k]
        if max(b, c) < NOISE_S:
            continue
        ratio = c / b if b > 0 else float("inf")
        if ratio > RATIO_MAX and c - b > 0.1:
            regressions.append((k, b, c, ratio))
        elif ratio < 1 / RATIO_MAX:
            improved.append((k, b, c, ratio))
    for k, b, c, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"REGRESSED {k}: {b:.3f}s -> {c:.3f}s ({r:.2f}x)")
    for k, b, c, r in sorted(improved, key=lambda x: x[3]):
        print(f"improved  {k}: {b:.3f}s -> {c:.3f}s ({r:.2f}x)")
    tot_b = sum(bq[k] for k in shared)
    tot_c = sum(cq[k] for k in shared)
    print(f"shared keys: {len(shared)}  total {tot_b:.1f}s -> {tot_c:.1f}s "
          f"({tot_c / tot_b:.2f}x)  regressions: {len(regressions)}")
    if regressions:
        print(f"DRIFT GATE FAILED: {len(regressions)} key(s) above {RATIO_MAX}x")
        return 1
    print("DRIFT GATE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

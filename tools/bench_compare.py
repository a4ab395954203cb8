"""Compare two bench.py JSON outputs and report per-query deltas.

Usage:  python tools/bench_compare.py BENCH_r1.json BENCH_r2.json [--tol 0.15]

Exit code 1 if any query regressed more than --tol (relative) beyond the
run-to-run noise floor (2 × floor_per_query when present) — the guard to
run between rounds so a plan regression (lost broadcast, new shuffle)
shows up as a number, not a feeling.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=0.15)
    ap.add_argument("--calibrate", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="normalize by each run's calibration_s (the "
                    "fixed CPU kernel bench.py times), so hypervisor "
                    "fast/slow phases cancel out of the comparison.  "
                    "DEFAULT: on when both files carry calibration_s "
                    "(r8+); --no-calibrate forces raw seconds")
    ap.add_argument("--minus-floor", action="store_true",
                    help="compare queries_minus_floor instead of raw wall")
    args = ap.parse_args()

    with open(args.base) as fh:
        base = json.load(fh)
    with open(args.new) as fh:
        new = json.load(fh)

    noise = 2.0 * max(
        base.get("floor_per_query", 0.0), new.get("floor_per_query", 0.0)
    )
    qkey = "queries_minus_floor" if args.minus_floor else "queries"
    if args.minus_floor:
        for side, d in (("base", base), ("new", new)):
            if qkey not in d:
                print(f"note: {side} file has no {qkey}; falling back to "
                      "raw 'queries' for that side — mixed metrics, the "
                      "floor stays inside its numbers")
    bq = dict(base.get(qkey) or base.get("queries", {}))
    nq = dict(new.get(qkey) or new.get("queries", {}))
    # shared-set ratio in RAW seconds first (quoted alongside normalized)
    shared = sorted(set(bq) & set(nq))
    raw_b = sum(bq[k] for k in shared)
    raw_n = sum(nq[k] for k in shared)
    cal_b = cal_n = 1.0
    calibrate = args.calibrate
    if calibrate is None:
        calibrate = bool(base.get("calibration_s") and new.get("calibration_s"))
    if calibrate:
        cal_b = base.get("calibration_s") or 1.0
        cal_n = new.get("calibration_s") or 1.0
        if not base.get("calibration_s") or not new.get("calibration_s"):
            print("note: calibration_s missing from one side; "
                  "normalization is a no-op for that side")
        bq = {k: v / cal_b for k, v in bq.items()}
        nq = {k: v / cal_n for k, v in nq.items()}
        noise /= max(cal_b, cal_n)
        print(f"calibration: base={cal_b:.3f}s new={cal_n:.3f}s "
              f"(values below in calibration units)")
    regressions = []
    print(f"{'query':32s} {'base':>8s} {'new':>8s} {'delta':>8s}")
    for name in sorted(set(bq) | set(nq)):
        b, n = bq.get(name), nq.get(name)
        if b is None or n is None:
            print(f"{name:32s} {b or '-':>8} {n or '-':>8}   (added/removed)")
            continue
        delta = n - b
        flag = ""
        if n > b * (1 + args.tol) and delta > noise:
            flag = "  << REGRESSION"
            regressions.append(name)
        print(f"{name:32s} {b:8.3f} {n:8.3f} {delta:+8.3f}{flag}")
    print(
        f"\ntotal: base={base.get('value')}s new={new.get('value')}s "
        f"noise_floor={noise:.3f}s tol={args.tol:.0%}"
    )
    if shared and raw_b:
        line = (f"shared-{len(shared)} {qkey} ratio: "
                f"raw {raw_n / raw_b:.3f}x")
        if calibrate and cal_b and cal_n:
            norm = (raw_n / cal_n) / (raw_b / cal_b)
            line += f", calibration-normalized {norm:.3f}x"
        print(line)
    if regressions:
        print(f"REGRESSED: {', '.join(regressions)}")
        return 1
    print("no regressions beyond noise")
    return 0


if __name__ == "__main__":
    sys.exit(main())

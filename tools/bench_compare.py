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
    # r12: per-query nearest-in-time kernel samples, when both files
    # carry them — each query divides by the sample taken in ITS phase
    # of the run, so intra-run host drift (26% within one r11 run)
    # cancels per query instead of smearing across the whole run.
    cpq_b = base.get("calibration_per_query") or {}
    cpq_n = new.get("calibration_per_query") or {}
    per_query_cal = calibrate and cpq_b and cpq_n

    def spread(d: dict) -> str:
        s = d.get("calibration_samples") or []
        if not s:
            return "n/a"
        med = sorted(s)[len(s) // 2]
        return (f"n={len(s)} min={min(s):.3f} med={med:.3f} "
                f"max={max(s):.3f} drift={max(s) / min(s):.2f}x")

    if calibrate:
        cal_b = base.get("calibration_s") or 1.0
        cal_n = new.get("calibration_s") or 1.0
        if not base.get("calibration_s") or not new.get("calibration_s"):
            print("note: calibration_s missing from one side; "
                  "normalization is a no-op for that side")
        if per_query_cal:
            bq = {k: v / cpq_b.get(k, cal_b) for k, v in bq.items()}
            nq = {k: v / cpq_n.get(k, cal_n) for k, v in nq.items()}
            print("calibration (per-query nearest-in-time samples):")
            print(f"  base: {spread(base)}")
            print(f"  new:  {spread(new)}")
        else:
            bq = {k: v / cal_b for k, v in bq.items()}
            nq = {k: v / cal_n for k, v in nq.items()}
            print(f"calibration: base={cal_b:.3f}s new={cal_n:.3f}s "
                  f"(values below in calibration units)")
        noise /= max(cal_b, cal_n)
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
            if per_query_cal:
                # bq/nq are already per-query-normalized above
                tot = sum(nq[k] for k in shared) / sum(bq[k] for k in shared)
                ratios = sorted(nq[k] / bq[k] for k in shared
                                if bq[k] > 0.02 and nq[k] > 0.02)
                line += f", phase-normalized total {tot:.3f}x"
                if ratios:
                    med = ratios[len(ratios) // 2]
                    line += (f", median per-query {med:.3f}x "
                             f"(over {len(ratios)} queries >20ms)")
            else:
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

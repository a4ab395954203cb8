"""A/B a runtime SQL conf over a query subset, interleaved per run.

Host phases drift within minutes (r11/r12 calibration spread), so A-then-B
whole-suite comparisons confound conf with phase.  This harness alternates
A and B *runs of the same query* back-to-back: for each query it executes
A,B,A,B,A,B and reports per-arm min — phase noise hits both arms equally.

Usage:
    python tools/ab_experiment.py --conf spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=134217728 \
        [--sf /root/testdata/sf0.1] tpcds_q14 tpcds_q95 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", action="append", required=True,
                    help="key=value applied in the B arm (repeatable)")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES

    confs = [c.split("=", 1) for c in args.conf]
    spark = get_spark("ab-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()
    defaults = {k: spark.conf.get(k, None) for k, _ in confs}

    def set_arm(b: bool) -> None:
        for k, v in confs:
            if b:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    out = {}
    for name in args.names:
        if name not in QUERIES:
            print(f"skip {name}", file=sys.stderr)
            continue
        a_runs, b_runs = [], []
        for _ in range(args.runs):
            for b, dest in ((False, a_runs), (True, b_runs)):
                set_arm(b)
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, args.sf).collect()
                dest.append(time.perf_counter() - t0)
                _ = len(rows)
        set_arm(False)
        out[name] = {"A_min": round(min(a_runs), 3), "B_min": round(min(b_runs), 3),
                     "A": [round(x, 3) for x in a_runs],
                     "B": [round(x, 3) for x in b_runs]}
        print(f"{name}: A={out[name]['A_min']} B={out[name]['B_min']}", flush=True)
    tot_a = sum(v["A_min"] for v in out.values())
    tot_b = sum(v["B_min"] for v in out.values())
    print(json.dumps({"total_A_min": round(tot_a, 3), "total_B_min": round(tot_b, 3),
                      "queries": out}))


if __name__ == "__main__":
    main()

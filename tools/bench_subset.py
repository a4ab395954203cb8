"""Run bench.py's methodology over an explicit query subset.

Round-over-round bench totals are only comparable on the same query set in
a comparable JVM state (round-3 lesson: +25% raw drift across rounds with
zero code change to the measured queries).  This tool re-runs a named
subset — e.g. the previous round's query list — in a FRESH JVM with the
same min-of-3 / floor-sampling methodology as bench.py, so a round can
demonstrate parity (or find a real regression) instead of guessing.

Usage:
    python tools/bench_subset.py --names-file /tmp/r2_queries.txt \
        [--sf /root/testdata/sf0.1] [--out /tmp/bench_subset.json]
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
    ap.add_argument("--names-file", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    names = [l.strip() for l in open(args.names_file) if l.strip()]

    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES
    from pyspark.sql import functions as F

    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    def measure_floor() -> float:
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            spark.range(1000).groupBy((F.col("id") % 7).alias("k")).agg(
                F.sum("id").alias("s")
            ).collect()
            runs.append(time.perf_counter() - t0)
        return min(runs)

    floors = [measure_floor()]
    timings: dict[str, float] = {}
    local_floor: dict[str, float] = {}
    for i, name in enumerate(sorted(names)):
        if name not in QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        if i and i % 10 == 0:
            floors.append(measure_floor())
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, args.sf).collect()
            runs.append(time.perf_counter() - t0)
            _ = len(rows)
        timings[name] = round(min(runs), 3)
        local_floor[name] = floors[-1]
    floors.append(measure_floor())
    q_minus_floor = {
        n: round(max(0.0, t - local_floor[n]), 3) for n, t in timings.items()
    }
    out = {
        "sf": args.sf,
        "n_queries": len(timings),
        "value": round(sum(timings.values()), 3),
        "floor_samples": [round(f, 3) for f in floors],
        "queries": timings,
        "queries_minus_floor": q_minus_floor,
        "value_minus_floor": round(sum(q_minus_floor.values()), 3),
    }
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()

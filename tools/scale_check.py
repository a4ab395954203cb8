"""Scaling check: run the bench queries at every available scale factor
and report how wall time grows with data size.

The 100 TB argument in one table: a query whose time is flat across
sf0.001→0.1 is dominated by fixed per-query cost (planning, codegen, task
launch — amortizes away at scale); one that grows linearly is data-bound
and its slope is the number that matters.  Superlinear growth flags a
plan that won't survive 100×.

    python tools/scale_check.py                 # all bench queries
    python tools/scale_check.py tpch_q1 tpch_q5 # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES, TAGS

    spark = get_spark("scale_check")
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or [
        n for n in sorted(QUERIES) if "bench" in TAGS.get(n, ()) or n.startswith("tpch_")
    ]
    sfs = [d for d in SFS if os.path.isdir(d)]
    for d in sfs:  # warm footers
        spark.read.parquet(os.path.join(d, "lineitem.parquet")).count()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        per_sf: dict[str, float] = {}
        for d in sfs:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, d).collect()
                runs.append(time.perf_counter() - t0)
            per_sf[d.rsplit("sf", 1)[1]] = round(min(runs), 3)
        out[name] = per_sf
        vals = list(per_sf.values())
        # growth from smallest to largest SF (100x data)
        growth = round(vals[-1] / vals[0], 2) if vals[0] > 0 else None
        print(f"{name:32s} " + "  ".join(f"sf{k}={v:.2f}s" for k, v in per_sf.items())
              + f"  growth_100x={growth}x")
    print(json.dumps({"scale_check": out}))


if __name__ == "__main__":
    main()

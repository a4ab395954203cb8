"""Strong-scaling probe (r13, r12 verdict item 2b): run entries at ONE
scale factor under the CURRENT $SPARK_GRAFT_CPUS core count with the noop
sink and print one JSON line {name: min_sec}.

The driver's 8-vs-32-core block runs at sf0.1, where every entry sits on
the 0.15-0.35 s orchestration floor and core count is invisible (r12
PERF scaling ratios ≈1 everywhere).  At sf1 the heavies are seconds of
real execution, so the 8-core/32-core ratio of THIS probe is the
strong-scaling evidence sf0.1 cannot provide.  Run twice:

    SPARK_GRAFT_CPUS=32 python tools/core_scaling.py <names...>
    SPARK_GRAFT_CPUS=8  python tools/core_scaling.py <names...>

and record the ratios in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.path.join(_ROOT, ".scale", "sf1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--max-part-bytes", type=int, default=0,
                    help="probe-only spark.sql.files.maxPartitionBytes "
                         "override: the sf1 scratch tables are ~5-110 MB "
                         "of compressed parquet, which packs into 1-2 scan "
                         "splits at the default 128 MB — the scan stages "
                         "then run 1-2 tasks at ANY core count and mask "
                         "the parallelism this probe exists to measure.  "
                         "At 100 TB inputs arrive in thousands of splits; "
                         "a small split size reproduces that shape locally.")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES

    spark = get_spark("core-scaling")
    if args.max_part_bytes:
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(args.max_part_bytes))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    out: dict[str, float] = {}
    for name in args.names:
        if name not in QUERIES:
            print(f"skip {name}", file=sys.stderr)
            continue
        # untimed warm build first: persisted index artifacts (ANN/BM25)
        # build on first touch of a new sf dir and must not be timed here
        QUERIES[name](spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": int(cpus), "sf_dir": args.sf, "sink": "noop",
                      "runs": args.runs,
                      "max_part_bytes": args.max_part_bytes or None,
                      "queries": out}))


if __name__ == "__main__":
    main()

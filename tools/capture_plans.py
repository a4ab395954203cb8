"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r12 --suffix before [--sf DIR] name...
    python tools/capture_plans.py --tag r12 --suffix before --bench

Writes plans/<tag>/<name>_<suffix>.txt with the formatted physical plan
(pre-execution AQE plan).  Building a query DataFrame may eagerly build
persisted index artifacts (similarity/text lifecycles) — that is part of
the entry's contract and happens here exactly as in bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--bench", action="store_true",
                    help="capture every bench-tagged query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES, TAGS

    names = list(args.names)
    if args.bench:
        names += [n for n in sorted(QUERIES)
                  if "bench" in TAGS.get(n, ()) or n.startswith("tpch_")]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # capture the failure for the record
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Split per-query time into build/analysis (QUERIES[name]() returning the
DataFrame: spark.sql parse+analyze, or eager per-op DataFrame analysis) vs
execution (.collect()).  min over --runs fresh builds; calibration kernel
bracketing so host phase is visible.  Usage:
    python tools/split_profile.py [--sf DIR] [--runs N] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import QUERIES
    from pyspark.sql import functions as F

    spark = get_spark("split-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    def cal() -> float:
        t0 = time.perf_counter()
        spark.range(0, 30_000_000, 1, 8).select(
            ((F.col("id") * 2654435761) % 1000003).alias("k"),
            (F.col("id") % 97).alias("v"),
        ).groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
                           ).agg(F.sum("s"), F.max("n")).collect()
        return time.perf_counter() - t0

    print(f"cal_start {cal():.3f}", flush=True)
    for name in args.names:
        if name not in QUERIES:
            print(f"skip {name}", flush=True)
            continue
        builds, execs = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            t1 = time.perf_counter()
            rows = df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            _ = len(rows)
        print(f"{name:40s} build={min(builds):6.3f} exec={min(execs):6.3f} "
              f"builds={[round(b,2) for b in builds]} "
              f"execs={[round(e,2) for e in execs]}", flush=True)
    print(f"cal_end {cal():.3f}", flush=True)


if __name__ == "__main__":
    main()

"""Pre-clear registry positions through the driver's exact sequence.

The driver's per-round gate runs, for each prefix entry, IN ONE PROCESS:
  1. smoke: call the entry at sf0.001 (schema must be stable, >=0 rows)
  2. oracle: call the entry at sf0.01 and compare against its DuckDB
     oracle (rows + columns + order-insensitive values)

An entry can be green under a standalone oracle sweep yet fail this
sequence (SF-dependent cached state, lazy singletons, scratch layouts
keyed off the first sf_dir seen — the ADVICE r8 class).  This tool
replays the sequence for a contiguous registry position range so future
driver prefixes carry no first-contact risk.

Usage:
    python tools/preclear.py [--start N] [--stop M] [--shard K/N]

Position indices refer to the CURRENT interleaved registry order (the
same order the driver walks).  --shard round-robins within the range so
multiple processes split the wall time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_SF = "/root/testdata/sf0.001"
ORACLE_SF = "/root/testdata/sf0.01"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--stop", type=int, default=None)
    ap.add_argument("--shard", default=None, metavar="K/N")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import ORACLES, QUERIES, TAGS
    from tools.oracle_check import compare, duck_connection

    names = list(QUERIES)
    stop = args.stop if args.stop is not None else len(names)
    names = names[args.start : stop]
    if args.shard:
        k, n = (int(x) for x in args.shard.split("/"))
        if not 1 <= k <= n:
            ap.error(f"--shard {args.shard}: need 1 <= K <= N")
        names = [nm for i, nm in enumerate(names) if i % n == k - 1]

    spark = get_spark("preclear", shuffle_partitions=8)
    con = duck_connection(ORACLE_SF)

    failures = 0
    for name in names:
        t0 = time.time()
        # 1. driver smoke: run at sf0.001 first (same process).
        try:
            smoke_pdf = QUERIES[name](spark, SMOKE_SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: smoke(sf0.001) error: {e}", flush=True)
            failures += 1
            continue
        # 2. driver oracle: run at sf0.01 and compare.
        pinned = [
            t.split(":", 1)[1]
            for t in TAGS.get(name, ())
            if t.startswith("sf-pinned:")
        ]
        if pinned and pinned[0] != ORACLE_SF:
            print(f"ok?  {name}: smoke green; oracle pinned to {pinned[0]} "
                  f"({len(smoke_pdf)} smoke rows)", flush=True)
            continue
        try:
            spark_pdf = QUERIES[name](spark, ORACLE_SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle-run(sf0.01) error: {e}", flush=True)
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok?  {name}: rows-only ({len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}", flush=True)
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        hard = [p for p in problems if "(warn)" not in p]
        if hard:
            failures += 1
            print(f"FAIL {name}: " + " | ".join(hard), flush=True)
        else:
            tail = "" if not problems else "  [" + " | ".join(problems) + "]"
            print(f"PASS {name} ({len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s){tail}", flush=True)

    print(f"\n{failures} failures / {len(names)} checked", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

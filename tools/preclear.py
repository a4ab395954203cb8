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
    from datafusion_spark.queries import QUERIES
    from tools.oracle_check import duck_connection, run_entry, sf_pinned_to

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
        # 1. driver smoke: run at sf0.001 first (same process).  The only
        # step preclear adds over oracle_check's gate — everything from
        # here down is the shared run_entry sequence.
        try:
            smoke_pdf = QUERIES[name](spark, SMOKE_SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: smoke(sf0.001) error: {e}", flush=True)
            failures += 1
            continue
        # 2. driver oracle: run at sf0.01 and compare (shared gate).
        pinned = sf_pinned_to(name)
        if pinned and pinned != ORACLE_SF:
            print(f"ok?  {name}: smoke green; oracle pinned to {pinned} "
                  f"({len(smoke_pdf)} smoke rows)", flush=True)
            continue
        status, detail = run_entry(spark, con, name, ORACLE_SF)
        if status == "fail":
            failures += 1
            print(f"FAIL {name}: {detail}", flush=True)
        elif status == "rows-only":
            print(f"ok?  {name}: rows-only ({detail})", flush=True)
        else:
            print(f"PASS {name} ({detail})", flush=True)

    print(f"\n{failures} failures / {len(names)} checked", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names and (order-
insensitively) values.  Exact match is required for non-float columns;
floats are compared bit-exact first, with a max-abs-diff report when they
differ so determinism bugs are visible immediately.

Usage:
    python tools/oracle_check.py [--sf DIR] [--shard K/N] [names...]

The full registry sweep takes ~25 min serially; ``--shard K/N`` (1-indexed)
partitions the name list round-robin so N processes cover it in ~1/N the
wall time, e.g. the routine pre-commit full sweep:

    for k in 1 2 3 4; do python tools/oracle_check.py --shard $k/4 & done; wait
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from datafusion_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _sortable(v):
    """Make unhashable cells (binary, arrays) sortable/comparable: bytes and
    bytearray normalize to the same hex text, list/ndarray to a joined text,
    and null-likes (None vs float NaN — Spark hands back None where DuckDB's
    fetchdf uses NaN in object columns, e.g. nullable booleans) to None."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ", ".join(str(_sortable(x)) for x in v) + "]"
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(_sortable)
        if str(df[c].dtype).startswith("datetime"):
            # Normalize to [us]: Spark hands back datetime64[us], DuckDB
            # [ns] — a pure storage-resolution difference that would
            # otherwise print a dtype warning on every timestamp column.
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    # The driver's canonicalizer (sort_values → factorize) cannot hash
    # list/dict cells and ERRs the whole entry (r5: fn_edge_array_minmax_ops);
    # _sortable() below stringifies them so the local sweep would otherwise
    # stay blind.  Detect them on the RAW frame, before normalization.
    for c in spark_pdf.columns:
        col = spark_pdf[c]
        if str(col.dtype) == "object":
            sample = next(
                (v for v in col
                 if v is not None and not (isinstance(v, float) and math.isnan(v))),
                None,
            )
            if isinstance(sample, (list, dict)) or type(sample).__name__ == "ndarray":
                problems.append(
                    f"col {c}: {type(sample).__name__} cells — driver harness "
                    "cannot hash ARRAY/MAP output; render to text on both sides"
                )
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = sv.astype("float64").to_numpy()
            da = dv.astype("float64").to_numpy()
            mask = ~(pd.isna(sa) & pd.isna(da))
            diff = abs(sa - da)
            mx = float(diff[mask].max()) if mask.any() and len(sa) else 0.0
            if not (mx == 0.0 or math.isnan(mx)):
                problems.append(f"col {c}: max abs diff {mx:g} (NOT bit-exact)")
            else:
                # The driver's value hash is BIT-sensitive: -0.0 and +0.0
                # compare numerically equal (abs diff 0) but hash apart.
                # Both hard failures so far (r3 abs(-0.0), r4 ROUND→-0.0)
                # slipped through this path; check sign bits explicitly.
                sz = np.signbit(sa) & (sa == 0.0)
                dz = np.signbit(da) & (da == 0.0)
                if (sz != dz).any():
                    bad = int(np.argmax(sz != dz))
                    problems.append(
                        f"col {c}: signed-zero mismatch at row {bad}: "
                        f"spark={sa[bad]!r} duck={da[bad]!r} (hash-breaking)"
                    )
        else:
            if not sv.astype(str).equals(dv.astype(str)):
                bad = (sv.astype(str) != dv.astype(str)).idxmax()
                problems.append(
                    f"col {c}: values differ, e.g. row {bad}: spark={sv[bad]!r} duck={dv[bad]!r}"
                )
        if str(sv.dtype) != str(dv.dtype):
            # int-vs-float disagreement is HASH-BREAKING at the driver (it
            # hashes raw values: 5 != 5.0) — hard failure, not a warning.
            # Root cause is almost always a width/widening mismatch, e.g.
            # DuckDB SUM(BIGINT)→HUGEINT→float64 (r5: fn_edge_limit_corners);
            # fix with explicit CASTs on both sides (SURVEY §4 rule 5).
            s_int = pd.api.types.is_integer_dtype(sv)
            d_int = pd.api.types.is_integer_dtype(dv)
            s_flt = pd.api.types.is_float_dtype(sv)
            d_flt = pd.api.types.is_float_dtype(dv)
            if (s_int and d_flt) or (s_flt and d_int):
                problems.append(
                    f"col {c}: dtype spark={sv.dtype} duck={dv.dtype} "
                    "(int-vs-float: driver hash WILL mismatch — cast both sides)"
                )
            else:
                problems.append(f"col {c}: dtype spark={sv.dtype} duck={dv.dtype} (warn)")
    return problems


def run_entry(spark, con, name: str, sf_dir: str) -> tuple[str, str]:
    """Run ONE registry entry through the driver's oracle gate.

    The single source of truth for the per-entry sequence (Spark run →
    rows-only short-circuit → DuckDB oracle → compare → hard/warn split);
    oracle_check's sweep and preclear's smoke-first replay both call this
    so the gate logic cannot drift between the two tools (ADVICE r8).

    Returns ``(status, detail)``:
      ``"pass"``       oracle compared, no hard problems (detail: rows +
                       any dtype warns)
      ``"rows-only"``  no oracle registered; the Spark plan executed
      ``"fail"``       Spark error, DuckDB error, or hard compare mismatch
    """
    from datafusion_spark.queries import ORACLES, QUERIES

    t0 = time.time()
    try:
        spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return "fail", f"spark error: {e}"
    if name not in ORACLES:
        return "rows-only", f"{len(spark_pdf)} rows, {time.time()-t0:.1f}s"
    try:
        duck_pdf = con.execute(ORACLES[name]).df()
    except Exception as e:  # noqa: BLE001
        return "fail", f"duckdb error: {e}"
    problems = compare(name, spark_pdf, duck_pdf)
    hard = [p for p in problems if "(warn)" not in p]
    if hard:
        return "fail", " | ".join(problems)
    detail = f"{len(spark_pdf)} rows, {time.time()-t0:.1f}s"
    if problems:
        detail += "  [" + " | ".join(problems) + "]"
    return "pass", detail


def sf_pinned_to(name: str) -> str | None:
    """The sf_dir an entry's oracle is pinned to via tag, if any."""
    from datafusion_spark.queries import TAGS

    for t in TAGS.get(name, ()):
        if t.startswith("sf-pinned:"):
            return t.split(":", 1)[1]
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--shard", default=None, metavar="K/N",
                    help="run the K-th of N round-robin shards (1-indexed)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.queries import ORACLES, QUERIES, TAGS

    names = args.names or sorted(QUERIES)
    if args.shard:
        k, n = (int(x) for x in args.shard.split("/"))
        if not 1 <= k <= n:
            ap.error(f"--shard {args.shard}: need 1 <= K <= N")
        names = [nm for i, nm in enumerate(names) if i % n == k - 1]
    # Entries whose oracle is pinned to one sf_dir (tag "sf-pinned:<dir>")
    # only compare apples-to-apples at that dir; skip them elsewhere.
    skipped = [
        nm for nm in names
        if any(t.startswith("sf-pinned:") and t.split(":", 1)[1] != args.sf
               for t in TAGS.get(nm, ()))
    ]
    for nm in skipped:
        print(f"skip {nm}: oracle pinned to a different sf_dir")
    names = [nm for nm in names if nm not in skipped]
    spark = get_spark("oracle_check", shuffle_partitions=8)
    con = duck_connection(args.sf)

    failures = 0
    for name in names:
        if name not in QUERIES:
            print(f"?? {name}: not registered")
            failures += 1
            continue
        status, detail = run_entry(spark, con, name, args.sf)
        if status == "fail":
            failures += 1
            print(f"FAIL {name}: {detail}")
        elif status == "rows-only":
            print(f"ok?  {name}: rows-only ({detail})")
        else:
            print(f"ok   {name}: {detail}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Full-registry plan→SQL unparser sweep (the reference validates its
unparser with roundtrip_statement batteries in sql/tests/cases/plan_to_sql.rs;
this is the same contract run over every registry entry's analyzed plan).

For each registry entry, build the DataFrame at sf0.001, unparse with
``to_sql`` and re-execute the text: every outcome must be an exact
round-trip or a clean DialectError refusal — a divergence (different rows
from the emitted text) is the failure class that matters.

``--reasons`` buckets the refusals by their DialectError message head so
the remaining refusal surface stays auditable (which Catalyst renderings
are lossy, which plan nodes have no SQL spelling).

Usage:
    python tools/unparse_sweep.py [--reasons] [names...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _reason_key(msg: str) -> str:
    """Collapse a DialectError message to its class (drop the payload)."""
    m = re.match(r"unsupported plan node for unparsing: (\w+)", msg)
    if m:
        return f"plan-node:{m.group(1)}"
    m = re.match(r"expression does not re-parse as SQL: ", msg)
    if m:
        tail = msg[m.end():]
        for marker in ("scalarsubquery", "exists", "listquery",
                       "lambdafunction"):
            if marker in tail.lower():
                return f"expr:{marker}"
        return "expr:other"
    return msg.split(":")[0][:80]


def _duckdb_rows_match(spark_df, duck_pdf) -> bool:
    """Cross-engine VALUE equivalence for the federation pass.

    Unlike the Spark re-execution pass (bit-exact by construction — same
    engine both sides), DuckDB executes the same semantics with its own
    summation order, so float aggregates may differ in the last bits:
    compare with a tight relative tolerance instead of bit equality.
    Column order/naming and row counts must match exactly."""
    import math

    import pandas as pd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle_check import normalize

    s = normalize(spark_df.toPandas())
    d = normalize(duck_pdf)
    if list(s.columns) != list(d.columns) or len(s) != len(d):
        return False
    for c in s.columns:
        sv, dv = s[c], d[c]
        s_num = pd.api.types.is_numeric_dtype(sv)
        d_num = pd.api.types.is_numeric_dtype(dv)
        if s_num and d_num:
            import numpy as np

            sa = sv.astype("float64").to_numpy()
            da = dv.astype("float64").to_numpy()
            both_nan = pd.isna(sa) & pd.isna(da)
            # inf == inf (same sign) must compare equal: inf - inf is
            # NaN, which the tolerance check would flag (first seen
            # when fn_edge_lossy_casts' '1e400' -> inf column reached
            # this pass)
            both_inf = (np.isinf(sa) & np.isinf(da)
                        & (np.sign(sa) == np.sign(da)))
            diff = abs(sa - da)
            tol = 1e-9 * (abs(sa) + abs(da)) + 1e-12
            bad = ~both_nan & ~both_inf & ~(diff <= tol)
            if bad.any():
                return False
        else:
            a = sv.map(lambda v: None if (isinstance(v, float)
                                          and math.isnan(v)) else v)
            b = dv.map(lambda v: None if (isinstance(v, float)
                                          and math.isnan(v)) else v)
            if not a.astype(str).equals(b.astype(str)):
                return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reasons", action="store_true",
                    help="print a histogram of refusal classes")
    ap.add_argument("--duckdb-exec", action="store_true",
                    help="for every Spark-exact entry, also unparse in the "
                         "DUCKDB dialect and EXECUTE the text in DuckDB, "
                         "value-comparing against the Spark rows (the "
                         "federation analog of the re-execution pass)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.compat.dialect import DialectError
    from datafusion_spark.compat.unparser import DUCKDB, to_sql
    from datafusion_spark.queries import QUERIES

    duck_con = None
    if args.duckdb_exec:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from oracle_check import duck_connection

        duck_con = duck_connection(SF)

    spark = get_spark("unparse_sweep", shuffle_partitions=8)
    names = args.names or list(QUERIES)
    ok = refused = diverged = err = 0
    dk_ok = dk_refused = dk_execerr = dk_diverged = 0
    dk_execerr_names: list[str] = []
    reasons: Counter[str] = Counter()
    refused_names: dict[str, list[str]] = {}
    dk_reasons: Counter[str] = Counter()
    dk_refused_names: dict[str, list[str]] = {}
    for name in names:
        try:
            with contextlib.redirect_stderr(io.StringIO()):
                df = QUERIES[name](spark, SF)
        except Exception:  # noqa: BLE001 - entries needing env/scratch state
            err += 1
            continue
        try:
            sql = to_sql(df)
        except DialectError as e:
            refused += 1
            key = _reason_key(str(e))
            reasons[key] += 1
            refused_names.setdefault(key, []).append(name)
            continue
        except Exception as e:  # noqa: BLE001 - crash = sweep failure
            print(f"HARDFAIL {name}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            err += 1
            continue
        try:
            # FULL collect on both sides: a .limit(K) cap takes an
            # ARBITRARY subset per physical plan, so two correct plans
            # "diverge" whenever the result exceeds K (r9 false positive
            # on dedup_simhash_pairs, 6150 rows).  Entries are aggregates
            # and top-ks at sf0.001 — full results stay collect-sized.
            with contextlib.redirect_stderr(io.StringIO()):
                a = sorted(map(repr, map(tuple, df.collect())))
                b = sorted(map(repr, map(tuple, spark.sql(sql).collect())))
        except Exception as e:  # noqa: BLE001
            print(f"REPARSE-ERR {name}: {str(e)[:120]}", flush=True)
            diverged += 1
            continue
        if a != b:
            print(f"DIVERGED {name}", flush=True)
            diverged += 1
            continue
        ok += 1
        if duck_con is None:
            continue
        # -- federation pass: same plan, DUCKDB dialect, real execution --
        try:
            dsql = to_sql(df, DUCKDB, validate=False)
        except DialectError as e:
            dk_refused += 1
            key = _reason_key(str(e))
            dk_reasons[key] += 1
            dk_refused_names.setdefault(key, []).append(name)
            continue
        except Exception as e:  # noqa: BLE001 - crash = sweep failure
            print(f"DUCKDB-HARDFAIL {name}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            dk_execerr += 1
            dk_execerr_names.append(name)
            continue
        try:
            duck_pdf = duck_con.execute(dsql).df()
        except Exception as e:  # noqa: BLE001 - remote-engine binder/exec
            # Spark-only functions / catalog objects the remote engine
            # lacks: a LOUD failure, acceptable (never silent wrongness)
            # but counted and listed so the refusal surface is auditable.
            dk_execerr += 1
            dk_execerr_names.append(f"{name} ({str(e).splitlines()[0][:60]})")
            continue
        try:
            same = _duckdb_rows_match(df, duck_pdf)
        except Exception as e:  # noqa: BLE001
            print(f"DUCKDB-CMP-ERR {name}: {str(e)[:120]}", flush=True)
            dk_execerr += 1
            dk_execerr_names.append(name)
            continue
        if same:
            dk_ok += 1
        else:
            print(f"DUCKDB-DIVERGED {name}", flush=True)
            dk_diverged += 1
    print(f"roundtrip={ok} refused={refused} diverged={diverged} "
          f"builderr={err}", flush=True)
    if duck_con is not None:
        print(f"duckdb_exec={dk_ok} duckdb_refused={dk_refused} "
              f"duckdb_execerr={dk_execerr} duckdb_diverged={dk_diverged}",
              flush=True)
        for n in dk_execerr_names:
            print(f"  execerr {n}", flush=True)
    if args.reasons:
        for key, n in reasons.most_common():
            sample = " ".join(refused_names[key][:6])
            print(f"  {n:4d}  {key}   e.g. {sample}", flush=True)
        if dk_reasons:
            print("duckdb-dialect refusal classes:", flush=True)
            for key, n in dk_reasons.most_common():
                sample = " ".join(dk_refused_names[key][:6])
                print(f"  {n:4d}  DK {key}   e.g. {sample}", flush=True)
    return 1 if (diverged or dk_diverged) else 0


if __name__ == "__main__":
    sys.exit(main())

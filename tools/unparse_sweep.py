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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reasons", action="store_true",
                    help="print a histogram of refusal classes")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from datafusion_spark import get_spark
    from datafusion_spark.compat.dialect import DialectError
    from datafusion_spark.compat.unparser import to_sql
    from datafusion_spark.queries import QUERIES

    spark = get_spark("unparse_sweep", shuffle_partitions=8)
    names = args.names or list(QUERIES)
    ok = refused = diverged = err = 0
    reasons: Counter[str] = Counter()
    refused_names: dict[str, list[str]] = {}
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
        else:
            ok += 1
    print(f"roundtrip={ok} refused={refused} diverged={diverged} "
          f"builderr={err}", flush=True)
    if args.reasons:
        for key, n in reasons.most_common():
            sample = " ".join(refused_names[key][:6])
            print(f"  {n:4d}  {key}   e.g. {sample}", flush=True)
    return 1 if diverged else 0


if __name__ == "__main__":
    sys.exit(main())

"""Physical-plan introspection: assert the plan you meant to declare.

DataFusion exposes EXPLAIN / EXPLAIN ANALYZE trees (reference:
datafusion/physical-plan/src/display.rs, explain.rs); Spark's equivalent
is df.explain("formatted").  These helpers parse that output so tests and
perf passes can assert structural properties — filters actually pushed
to parquet, scans pruned to needed columns, dimension joins broadcast,
shuffle counts bounded — instead of eyeballing plans.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all parquet scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan (column-pruning audit)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the static plan (AQE may merge at
    runtime).  Counts the formatted-mode operator list entries —
    ``(n) Exchange`` — so each exchange is counted once (the tree section
    repeats them), and broadcast exchanges are excluded (they move a small
    table, not the data)."""
    return len(re.findall(r"^\(\d+\) Exchange", explain_str(df), re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def explain_analyze(df: DataFrame) -> dict:
    """EXPLAIN ANALYZE equivalent (reference: datafusion/physical-plan/src/
    analyze.rs): execute the query and report the FINAL adaptive plan (after
    AQE re-planning — coalesced partitions, runtime-selected join
    strategies) plus row count and wall time.

    Returns {"rows", "wall_sec", "final_plan", "initial_plan"} — diffing
    the two plans shows what AQE changed at runtime.
    """
    import time

    initial = explain_str(df)
    t0 = time.perf_counter()
    n = df.count()
    wall = time.perf_counter() - t0
    final = df._jdf.queryExecution().executedPlan().toString()
    return {
        "rows": n,
        "wall_sec": round(wall, 3),
        "final_plan": final,
        "initial_plan": initial,
    }

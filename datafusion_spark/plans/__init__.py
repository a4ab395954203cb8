"""Plan-audit helpers (DataFusion's EXPLAIN/ANALYZE surface)."""

from datafusion_spark.plans.audit import (
    explain_analyze,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "explain_analyze",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
    "has_broadcast_join",
]

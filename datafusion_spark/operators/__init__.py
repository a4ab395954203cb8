"""Reusable distributed operators not covered by a single built-in."""

from datafusion_spark.operators.asof import asof_join

__all__ = ["asof_join"]

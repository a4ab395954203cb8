"""Shared expression helpers for oracle-checked queries.

Determinism note: double-precision SUM/AVG are order-dependent, and Spark's
shuffle ordering differs run-to-run and from DuckDB's.  For money-style
aggregates we therefore accumulate in DECIMAL(38,6) — decimal addition is
exact and associative, so Spark and DuckDB produce bit-identical results
regardless of partitioning — then cast the final value back to DOUBLE.
DataFusion solves this the same way for TPC-H (decimal arithmetic kernels:
reference datafusion/functions-aggregate/src/sum.rs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact distributed sum of a double column via decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount): the TPC-H revenue term."""
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


SQL_REVENUE = "l_extendedprice * (1 - l_discount)"

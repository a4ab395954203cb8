"""DataFusion DataFrame verbs on the PySpark DataFrame.

The reference DataFrame API (datafusion/core/src/dataframe/mod.rs; mirrored
by the public Python bindings) mostly overlaps PySpark's — select / filter /
join / sort / limit / distinct / union / count / collect / show / cache are
the same verbs.  ``install_dataframe_compat`` adds the spellings that
differ, as thin delegating methods, so a ported driver program keeps its
method names:

    aggregate(group_exprs, aggs)   -> groupBy(...).agg(...)
    select_columns(*names)         -> select
    with_column / with_column_renamed
    union_distinct                 -> union().distinct()
    union_by_name                  -> unionByName
    unnest_columns(*cols)          -> positional zip-unnest (arrays_zip +
                                      explode), matching the reference's
                                      multi-column unnest semantics
    to_pandas / to_arrow           -> toPandas / toArrow
    write_parquet / write_csv / write_json

Installation is idempotent and happens on ``datafusion_spark.compat``
import — only programs opting into the compat surface see the extra
methods; nothing built-in is overridden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _aggregate(self: DataFrame, group_expr, aggs) -> DataFrame:
    group = group_expr if isinstance(group_expr, (list, tuple)) else [group_expr]
    aggs = aggs if isinstance(aggs, (list, tuple)) else [aggs]
    if not group:
        return self.agg(*aggs)
    return self.groupBy(*group).agg(*aggs)


def _select_columns(self: DataFrame, *names: str) -> DataFrame:
    return self.select(*names)


def _with_column(self: DataFrame, name: str, expr) -> DataFrame:
    return self.withColumn(name, expr)


def _with_column_renamed(self: DataFrame, old: str, new: str) -> DataFrame:
    return self.withColumnRenamed(old, new)


def _union_distinct(self: DataFrame, other: DataFrame) -> DataFrame:
    return self.union(other).distinct()


def _union_by_name(self: DataFrame, other: DataFrame) -> DataFrame:
    return self.unionByName(other, allowMissingColumns=True)


def _unnest_columns(self: DataFrame, *cols: str) -> DataFrame:
    """Reference unnest semantics: multiple columns unnest POSITIONALLY
    (row i of each list lines up; shorter lists pad with NULL) — that is
    exactly arrays_zip + explode, one shuffle-free generator."""
    if not cols:
        return self
    if len(cols) == 1:
        return self.withColumn(cols[0], F.explode_outer(cols[0]))
    zipped = F.explode_outer(F.arrays_zip(*[F.col(c) for c in cols]))
    tmp = "__unnest_zip__"
    out = self.withColumn(tmp, zipped)
    for c in cols:
        out = out.withColumn(c, F.col(tmp).getField(c))
    return out.drop(tmp)


def _to_pandas(self: DataFrame):
    return self.toPandas()


def _to_arrow(self: DataFrame):
    return self.toArrow()


def _write_parquet(self: DataFrame, path: str, **options) -> None:
    self.write.mode("overwrite").options(**options).parquet(path)


def _write_csv(self: DataFrame, path: str, **options) -> None:
    opts = {"header": "true"}
    opts.update(options)
    self.write.mode("overwrite").options(**opts).csv(path)


def _write_json(self: DataFrame, path: str, **options) -> None:
    self.write.mode("overwrite").options(**options).json(path)


def _logical_plan_sql(self: DataFrame, dialect=None) -> str:
    """df.logical_plan() → SQL text via the unparser (the reference user's
    plan_to_sql(df.logical_plan()) two-step collapsed to one call)."""
    from datafusion_spark.compat.unparser import SPARK, to_sql

    return to_sql(self, dialect or SPARK)


_METHODS = {
    "aggregate": _aggregate,
    "select_columns": _select_columns,
    "with_column": _with_column,
    "with_column_renamed": _with_column_renamed,
    "union_distinct": _union_distinct,
    "union_by_name": _union_by_name,
    "unnest_columns": _unnest_columns,
    "to_pandas": _to_pandas,
    "to_arrow": _to_arrow,
    "write_parquet": _write_parquet,
    "write_csv": _write_csv,
    "write_json": _write_json,
    "logical_plan_sql": _logical_plan_sql,
}


def install_dataframe_compat() -> None:
    """Attach the DataFusion-spelled verbs to pyspark DataFrame (idempotent;
    never overrides an existing attribute)."""
    for name, fn in _METHODS.items():
        if not hasattr(DataFrame, name):
            setattr(DataFrame, name, fn)

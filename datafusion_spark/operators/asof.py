"""As-of (time-travel) join.

Joins each left row to the most recent right row at-or-before its
timestamp, per key — the operator DuckDB exposes as ASOF JOIN and pandas
as merge_asof.  DataFusion models this family with range/inequality join
predicates on its symmetric hash join (reference:
datafusion/physical-plan/src/joins/symmetric_hash_join.rs).

Spark-first implementation: union-and-carry-forward.  Tag both inputs,
union them, and run ONE window pass per key ordered by (ts, side):
``last(right_value, ignorenulls=True)`` carries the latest right row
forward onto each left row.  Cost: a single hash shuffle on the key +
a per-partition sort — strictly cheaper at scale than the naive
inequality join (which explodes to O(left × right-per-key) then
re-aggregates), and it never materializes candidate pairs.

At 100 TB: the shuffle partitions by `by` key (high-cardinality user/
device ids), so this parallelizes across executors; a skewed key is
handled by AQE skew-split since the window only needs per-key ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group.

    Returns the left rows with ``<value_col><suffix>`` columns appended
    (null when no prior right row exists).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]

    right_tagged = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, by)],
    )
    left_tagged = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c) for c in left.columns if c not in (on, by)],
    )
    # Right rows sort before left rows at equal timestamps → "<=" semantics.
    w = (
        Window.partitionBy(by)
        .orderBy(on, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left_tagged.unionByName(right_tagged).select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carr_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        by,
        on,
        *[c for c in left.columns if c not in (on, by)],
        *[F.col(f"__carr_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )

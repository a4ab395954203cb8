"""Skew mitigation: salted joins and salted aggregation.

When one join/group key carries a disproportionate share of rows (the
boilerplate-document band in LSH dedup, the power-user in event data), the
task owning that key becomes the straggler.  AQE's skew-join split handles
sort-merge cases adaptively; explicit salting is the deterministic,
planner-independent form — and the only option for aggregations.

Mechanics (join): the big side's key is extended with a salt in [0, n)
derived by hashing a spreading column; the small side is replicated n ways
(explode over all salts) so every (key, salt) combination still matches.
Results are EXACTLY those of the unsalted join — salt only spreads rows.
Cost: small side inflates n×, so n stays modest (8-32) and the small side
must be small; with a big-big skewed join, salt only the hot keys.

Reference behavior: DataFusion repartitions on the join key
(physical-plan/src/joins/hash_join.rs + repartition.rs) and hits the same
hot-partition wall; salting is the standard distributed remedy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    spread_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resistant to key skew on the big side.

    ``spread_col`` (default: all big-side columns) feeds the hash that
    assigns each big row a salt — deterministic, so results are stable
    run-to-run.  The output columns equal those of ``big.join(small, on,
    how)``.
    """
    spread: Column = (
        F.hash(F.col(spread_col)) if spread_col else F.hash(*[F.col(c) for c in big.columns])
    )
    big_s = big.withColumn("__salt", F.pmod(spread, F.lit(n_salts)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    finals: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with partial ``aggs``,
    then groupBy(keys) with ``finals`` re-aggregating the partials.  The
    hot key's rows split across n_salts reducers in phase one; phase two
    touches only (keys × salts) rows.  (Spark's partial aggregation does
    this automatically for algebraic aggregates — use this form for
    holistic ones, e.g. collect_list-based or exact distinct counts.)
    """
    # salt must differ WITHIN a key to spread it: derive from the input
    # partition, never from the key itself
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "__salt").agg(*aggs)
    return phase1.groupBy(*keys).agg(*finals)

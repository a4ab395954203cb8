"""Arrow-batched Python UDF entries — the sanctioned escape hatch.

Reference: DataFusion's ScalarUDF / AggregateUDF extension points
(datafusion/expr/src/udf.rs).  Spark equivalent: pandas_udf (vectorized
scalar) and applyInPandas (grouped map) — both move data as Arrow batches,
~10-100× faster than row-at-a-time Python UDFs.  These entries prove the
plumbing AND that results stay oracle-exact when the Python side is
written deterministically (sort before order-sensitive float ops, round
where engines' summation orders differ).

Scale: pandas_udf is a narrow map (no shuffle); applyInPandas shuffles
once on the group key and each group must fit in executor memory — fine
for per-type event groups, wrong for a single giant group (salt first).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _log1p_scaled_udf():
    # defined lazily: pandas_udf type resolution needs an active session
    @pandas_udf("double")
    def _log1p_scaled(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(v.abs()) * 100.0

    return _log1p_scaled


@query(
    "udf_vectorized_scalar",
    oracle="""
    SELECT event_id, ROUND(ln(1 + abs(value)) * 100.0, 6) AS transformed
    FROM events WHERE event_id < 1000
    """,
    tags=("udf", "pandas"),
)
def udf_vectorized_scalar(spark, sf_dir):
    """Vectorized scalar pandas_udf (Arrow batches, numpy inside) against
    the equivalent SQL expression — element-wise, so engine-order
    independent; rounded to absorb libm ulp differences."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    udf = _log1p_scaled_udf()
    return e.select(
        "event_id", F.round(udf(F.col("value")), 6).alias("transformed")
    )


_ZSCORE_SCHEMA = "event_id long, event_type string, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # deterministic: sort by event_id so float accumulation order is fixed
    pdf = pdf.sort_values("event_id")
    v = pdf["value"].astype("float64")
    mu = v.mean()
    sd = v.std(ddof=1)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": (v - mu) / sd,
        }
    )


@query(
    "udf_grouped_zscore",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
    tags=("udf", "pandas", "grouped"),
)
def udf_grouped_zscore(spark, sf_dir):
    """Grouped-map applyInPandas (custom per-group compute in pandas) vs
    the window-function formulation — one shuffle on the group key either
    way.  Rounded to 6dp: pandas' pairwise summation and the engines'
    streaming moments agree well past that."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = e.groupBy("event_type").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)
    return out.select("event_id", "event_type", F.round("zscore", 6).alias("zscore"))


@query(
    "udf_table_function",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '. ') AS p FROM documents
      WHERE doc_id < 200
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, p[i] AS sentence,
           CAST(LENGTH(p[i]) AS INT) AS n_chars
    FROM parts, unnest(generate_series(1, len(p))) AS t(i)
    WHERE p[i] <> ''
    """,
    tags=("udf", "udtf", "table-function"),
)
def udf_table_function(spark, sf_dir):
    """Python user-defined TABLE function (reference: datafusion/expr/src/
    udf TableFunctionImpl + functions-table/, sqllogictest
    table_functions.slt) — the row→rows extension
    point.  Spark 4's @udtf runs Arrow-batched and composes with LATERAL,
    so the expansion executes where the row lives (no shuffle, no
    collect).  The class-based eval keeps per-partition state possible
    (analyze/terminate hooks) — strictly more powerful than a flatMap
    lambda."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string, n_chars int")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". ")):
                if s:
                    yield i, s, len(s)

    spark.udtf.register("split_sentences", SplitSentences)
    from datafusion_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence, s.n_chars
        FROM documents d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id < 200
        """
    )


def _wavg_udaf():
    # GROUPED_AGG pandas UDF: the true UDAF extension point (one Arrow
    # batch stream in, one scalar out per group).  Inputs are kept
    # integer-exact (price scaled to cents, integer quantities) so the
    # float64 accumulation is order-independent — the same determinism
    # rule the built-in decimal aggregates follow (SURVEY §4).
    @pandas_udf("double")
    def _wavg(cents: pd.Series, qty: pd.Series) -> float:
        num = float((cents * qty).sum())
        den = float(qty.sum())
        return num / den if den else float("nan")

    @pandas_udf("long")
    def _nrows(qty: pd.Series) -> int:
        # GROUPED_AGG UDFs cannot mix with built-in aggregates in one
        # aggregation (INVALID_PANDAS_UDF_PLACEMENT), so the row count
        # rides along as a second pandas reducer.
        return int(len(qty))

    return _wavg, _nrows


@query(
    "udf_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(ROUND(l_extendedprice * 100) * l_quantity) AS DOUBLE)
               / CAST(SUM(l_quantity) AS DOUBLE) AS wavg_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf"),
)
def udf_grouped_agg_udaf(spark, sf_dir):
    """User-defined AGGREGATE function (reference: AggregateUDF,
    datafusion/expr/src/udaf.rs; core/tests/user_defined/
    user_defined_aggregates.rs).  Spark's extension point is the
    GROUPED_AGG pandas UDF: Arrow batches stream into a Python reducer
    that emits one scalar per group — here a quantity-weighted mean of
    price-in-cents.  Plans as an ObjectHashAggregate-style two-phase
    aggregate over the group-key shuffle (partial aggregation does not
    apply to opaque Python reducers, so ALL rows of a group reach one
    task — the documented UDAF scale contract: group count must exceed
    task count, which holds for any real GROUP BY)."""
    li = _t(spark, sf_dir, "lineitem")
    wavg, nrows = _wavg_udaf()
    cents = F.round(F.col("l_extendedprice") * 100).alias("cents")
    return (
        li.select("l_returnflag", cents, F.col("l_quantity").alias("qty"))
        .groupBy("l_returnflag")
        .agg(
            wavg(F.col("cents"), F.col("qty")).alias("wavg_cents"),
            nrows(F.col("qty")).alias("n"),
        )
    )


@query(
    "udf_window_pandas_udaf",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag AS rf,
           CAST(SUM(ROUND(l_extendedprice * 100) * l_quantity)
                OVER w AS DOUBLE)
               / CAST(SUM(l_quantity) OVER w AS DOUBLE) AS rolling_wavg,
           CAST(COUNT(*) OVER w AS BIGINT) AS frame_n
    FROM lineitem
    WHERE l_orderkey < 200
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_orderkey, l_linenumber,
                          ROUND(l_extendedprice * 100), l_quantity
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY rf, l_orderkey, l_linenumber, rolling_wavg
    """,
    tags=("udf", "udaf", "window"),
)
def udf_window_pandas_udaf(spark, sf_dir):
    """User-defined WINDOW function (reference: WindowUDF,
    datafusion/expr/src/udwf.rs; core/tests/user_defined/
    user_defined_window_functions.rs).  Spark reuses the GROUPED_AGG
    pandas UDF over a bounded window frame — the same Python reducer
    evaluates per sliding frame (rolling 3-row weighted mean here).
    Frames must be BOUNDED for pandas UDFs (Spark evaluates each frame
    as one Arrow slice); the built-in SUM-over-window spelling in the
    oracle proves value parity.  Scale: one shuffle on the partition
    key, frames evaluated locally — same plan shape as a built-in
    window aggregate, with Python batch cost on top."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    wavg, _ = _wavg_udaf()
    # (orderkey, linenumber) is NOT unique in the synthetic lineitem —
    # 58 duplicate keys below orderkey 200 — so the frame order extends
    # to the value columns; remaining ties are value-identical rows,
    # which cannot change any frame sum.
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "cents", "qty")
        .rowsBetween(-2, 0)
    )
    cents = F.round(F.col("l_extendedprice") * 100).alias("cents")
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            "l_returnflag", cents, F.col("l_quantity").alias("qty"),
        )
        .select(
            "l_orderkey", "l_linenumber",
            F.col("l_returnflag").alias("rf"),
            wavg(F.col("cents"), F.col("qty")).over(w).alias("rolling_wavg"),
            F.count(F.lit(1)).over(w).alias("frame_n"),
        )
        .orderBy("rf", "l_orderkey", "l_linenumber", "rolling_wavg")
    )

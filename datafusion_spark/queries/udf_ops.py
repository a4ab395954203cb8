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

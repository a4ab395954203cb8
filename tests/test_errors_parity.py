"""Negative-path parity, mirroring the reference's errors.slt
(sqllogictest/test_files/errors.slt: `statement error` / `query error`
directives).  A query engine's error surface is part of its contract:
a malformed query must FAIL — on both engines — rather than silently
return a wrong answer.

Two tiers:

* AGREEING_ERRORS — the dozen most common user mistakes; BOTH Spark
  (ANSI mode, the session default) and DuckDB raise.  A case that stops
  raising on either side is a regression (a silent-divergence hazard).
* KNOWN_DIVERGENCES — probed cases where Spark ANSI raises but DuckDB
  is permissive (division by zero yields inf/NULL, modulo-zero NULL,
  out-of-bounds list index NULL, multi-row scalar subquery picks a
  row).  These are engine-identity facts, pinned in BOTH directions so
  drift on either side is visible; oracle-checked entries must never
  rely on this surface.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL

# (case id, spark sql, duck sql) — identical text unless dialect demands
AGREEING_ERRORS = [
    ("unresolved_column", "SELECT nosuchcol FROM orders", None),
    ("unknown_table", "SELECT * FROM no_such_table_xyz", None),
    ("union_arity", "SELECT 1 UNION ALL SELECT 1, 2", None),
    (
        "union_type_array_vs_int",
        "SELECT 1 AS c UNION ALL SELECT array(1) AS c",
        "SELECT 1 AS c UNION ALL SELECT [1] AS c",
    ),
    ("bad_date_literal", "SELECT DATE 'not-a-date'", None),
    (
        "aggregate_in_where",
        "SELECT o_orderkey FROM orders WHERE SUM(o_totalprice) > 10",
        None,
    ),
    ("nested_aggregate", "SELECT SUM(MAX(o_totalprice)) FROM orders", None),
    ("nullif_arity", "SELECT nullif(1)", None),
    ("ungrouped_column", "SELECT o_custkey, COUNT(*) FROM orders", None),
    ("cast_string_to_int", "SELECT CAST('abc' AS INT)", None),
    (
        "ambiguous_column",
        "SELECT o_orderkey FROM orders a JOIN orders b"
        " ON a.o_orderkey = b.o_orderkey",
        None,
    ),
    (
        "order_by_unresolved",
        "SELECT o_orderkey FROM orders GROUP BY o_orderkey ORDER BY nosuch",
        None,
    ),
    ("bad_interval_literal", "SELECT INTERVAL 'zzz' DAY", None),
    (
        "unparseable_timestamp",
        "SELECT to_timestamp('31-02-2024', 'dd-MM-yyyy')",
        "SELECT strptime('31-02-2024', '%d-%m-%Y')",
    ),
    # r7 additions (probed: both engines raise)
    ("tinyint_overflow", "SELECT CAST(999999 AS TINYINT)", None),
    (
        "extract_bad_field",
        "SELECT EXTRACT(nosuch FROM TIMESTAMP '2020-01-01')",
        None,
    ),
    ("bad_month_cast", "SELECT CAST('2024-99-01' AS DATE)", None),
    ("str_plus_int", "SELECT 'a' + 1", None),
    (
        "dup_cte_name",
        "WITH t AS (SELECT 1 AS a), t AS (SELECT 2 AS a) SELECT * FROM t",
        None,
    ),
    (
        "groupby_ordinal_oob",
        "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY 99",
        None,
    ),
    ("sum_of_string", "SELECT SUM(o_orderstatus) FROM orders", None),
    ("values_arity", "SELECT * FROM (VALUES (1), (1, 2)) t(a)", None),
    (
        "window_in_where",
        "SELECT o_orderkey FROM orders"
        " WHERE row_number() OVER (ORDER BY o_orderkey) = 1",
        None,
    ),
    ("decimal_overflow_cast", "SELECT CAST(1e30 AS DECIMAL(5,2))", None),
]

# Spark (ANSI) raises; DuckDB returns the stated permissive value.
KNOWN_DIVERGENCES = [
    ("int_div_zero", "SELECT 1 / 0", "float division yields inf/NULL"),
    ("mod_zero", "SELECT CAST(1 AS INT) % 0", "NULL"),
    (
        "multirow_scalar_subquery",
        "SELECT (SELECT o_orderkey FROM orders) AS v",
        "picks a row instead of raising",
    ),
    ("array_index_out_of_bounds", "SELECT array(1,2,3)[99]", "NULL"),
    (
        "negative_array_index",
        "SELECT array(1,2,3)[-1]",
        "indexes from the end (returns 3)",
    ),
]
_DIVERGENCE_DUCK = {
    "array_index_out_of_bounds": "SELECT ([1,2,3])[99]",
    "negative_array_index": "SELECT ([1,2,3])[-1]",
}

# Both engines are PERMISSIVE but return DIFFERENT values — the most
# dangerous class (no error on either side, silently different answers).
# Pinned so oracle SQL never leans on this surface; generators exclude it
# (axis 14 draws substr lengths >= 0).
VALUE_DIVERGENCES = [
    (
        "negative_substring_length",
        "SELECT substring('abcdef', 2, -1) AS v",
        "",            # Spark: negative length -> empty string
        "a",           # DuckDB (PostgreSQL): start+len window clipped -> 'a'
    ),
]


@pytest.fixture(scope="module")
def duck(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/orders.parquet')"
    )
    from datafusion_spark.catalog import load_table

    load_table(spark, SF_SMALL, "orders").createOrReplaceTempView("orders")
    return con


@pytest.mark.parametrize(
    "case,spark_sql,duck_sql",
    AGREEING_ERRORS,
    ids=[c[0] for c in AGREEING_ERRORS],
)
def test_both_engines_raise(spark, duck, case, spark_sql, duck_sql):
    with pytest.raises(Exception):
        spark.sql(spark_sql).collect()
    with pytest.raises(Exception):
        duck.execute(duck_sql or spark_sql).fetchall()


@pytest.mark.parametrize(
    "case,sql,duck_behavior",
    KNOWN_DIVERGENCES,
    ids=[c[0] for c in KNOWN_DIVERGENCES],
)
def test_known_divergences_stay_diverged(spark, duck, case, sql, duck_behavior):
    """Spark ANSI raises; DuckDB is permissive.  Pinned in both
    directions: if Spark stops raising (ANSI drift) or DuckDB starts
    raising, the comparison harness's assumptions change and every
    oracle touching this surface needs re-audit."""
    with pytest.raises(Exception):
        spark.sql(sql).collect()
    duck.execute(_DIVERGENCE_DUCK.get(case, sql)).fetchall()  # must NOT raise


@pytest.mark.parametrize(
    "case,sql,spark_val,duck_val",
    VALUE_DIVERGENCES,
    ids=[c[0] for c in VALUE_DIVERGENCES],
)
def test_value_divergences_stay_pinned(spark, duck, case, sql, spark_val, duck_val):
    """Permissive-but-different: both engines accept the query and return
    DIFFERENT values.  Pinned on both sides so any convergence (or a new
    third behavior) is caught; the silent-wrong-answer class the
    comparison harness must never sample from."""
    got = spark.sql(sql).collect()[0][0]
    want = duck.execute(sql).fetchall()[0][0]
    assert got == spark_val, (case, got)
    assert want == duck_val, (case, want)
    assert got != want

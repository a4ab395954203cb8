"""Plan → SQL unparser: round-trip equivalence + dialect refusals.

Mirrors the reference's unparser test strategy (datafusion/sql/src/
unparser/plan.rs roundtrip_statement tests): build a plan with the
DataFrame verb surface, unparse, re-execute the SQL text, and require
row-for-row equality with the original plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_spark.compat.dialect import DialectError
from datafusion_spark.compat.unparser import ANSI, DUCKDB, SPARK, to_sql
from tests.conftest import SF_SMALL


def _li(spark):
    return spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")


def _orders(spark):
    return spark.read.parquet(f"{SF_SMALL}/orders.parquet")


def _assert_roundtrip(spark, df):
    sql = to_sql(df)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spark.sql(sql).collect()))
    assert a == b, f"roundtrip diverged for:\n{sql}"
    assert a, "roundtrip test must not be vacuous (0 rows)"
    return sql


def test_select_filter_sort_limit(spark):
    df = (_li(spark)
          .filter(F.col("l_quantity") < 10)
          .select("l_orderkey", "l_returnflag",
                  (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .alias("net"))
          .orderBy(F.col("net").desc(), "l_orderkey")
          .limit(25))
    sql = _assert_roundtrip(spark, df)
    assert "ORDER BY" in sql and "LIMIT 25" in sql


def test_join_aggregate(spark):
    li, o = _li(spark), _orders(spark)
    df = (li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("o_orderstatus") == "F")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                 .cast("double").alias("rev")))
    sql = _assert_roundtrip(spark, df)
    assert "INNER JOIN" in sql and "GROUP BY" in sql


def test_global_aggregate_no_group_by(spark):
    df = _li(spark).agg(F.count(F.lit(1)).alias("n"),
                        F.max("l_quantity").alias("mx"))
    sql = _assert_roundtrip(spark, df)
    assert "GROUP BY" not in sql


def test_window_distinct_union(spark):
    li, o = _li(spark), _orders(spark)
    w = (li.select("l_orderkey",
                   F.row_number().over(
                       Window.partitionBy("l_returnflag")
                       .orderBy("l_orderkey")).alias("rn"))
           .filter(F.col("rn") <= 2))
    assert "OVER (PARTITION BY" in _assert_roundtrip(spark, w)

    u = (li.select(F.col("l_returnflag").alias("k")).distinct()
           .unionAll(o.select(F.col("o_orderstatus").alias("k")).distinct()))
    assert "UNION ALL" in _assert_roundtrip(spark, u)


def test_semi_join_spark_only(spark):
    li, o = _li(spark), _orders(spark)
    semi = (o.join(li.filter(F.col("l_quantity") > 45),
                   o.o_orderkey == li.l_orderkey, "left_semi")
              .select("o_orderpriority").distinct())
    assert "LEFT SEMI JOIN" in _assert_roundtrip(spark, semi)
    with pytest.raises(DialectError):
        to_sql(semi, ANSI)


def test_duckdb_dialect_executes(spark):
    """Federation check: the DUCKDB-dialect text actually runs on DuckDB
    and returns the same rows — the reference's unparser exists exactly
    for this ship-a-fragment-to-another-engine path."""
    import duckdb

    df = (_li(spark).filter(F.col("l_quantity") < 5)
          .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))
    sql = to_sql(df, DUCKDB)
    assert "read_parquet(" in sql and "`" not in sql
    got = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    want = sorted((r[0], r[1]) for r in df.collect())
    assert got == want


def test_refusals(spark):
    li = _li(spark)
    with pytest.raises(DialectError):
        to_sql(li.sortWithinPartitions("l_orderkey"))
    with pytest.raises(DialectError):
        to_sql(li.dropDuplicates(["l_returnflag"]))
    # distinct over ALL columns IS SQL-expressible — must not refuse
    to_sql(li.select("l_returnflag", "l_linestatus").dropDuplicates())


def test_registry_entry_matches_original_plan(spark):
    """The registry entry re-executes unparsed SQL; its rows must equal
    the pre-unparse DataFrame built the same way."""
    from datafusion_spark.queries import QUERIES

    li, o = _li(spark), _orders(spark)
    orig = (li.filter(F.col("l_quantity") < 25)
              .join(o.filter(F.col("o_orderstatus") == "F"),
                    li.l_orderkey == o.o_orderkey)
              .groupBy("l_returnflag", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                   .cast("double").alias("revenue"))
              .orderBy("l_returnflag", "o_orderpriority").limit(20))
    got = QUERIES["compat_unparser_roundtrip"](spark, SF_SMALL)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, orig.collect()))


def test_setops_offset_range(spark):
    a = _li(spark).filter(F.col("l_quantity") < 45).select("l_returnflag")
    b = _li(spark).filter(F.col("l_quantity") > 40).select("l_returnflag")
    assert "INTERSECT" in _assert_roundtrip(spark, a.intersect(b))
    # a has far more rows per flag than b, so EXCEPT ALL keeps the surplus
    assert "EXCEPT ALL" in _assert_roundtrip(spark, a.exceptAll(b))

    off = (_orders(spark).select("o_orderkey")
           .orderBy("o_orderkey").offset(3).limit(5))
    sql = _assert_roundtrip(spark, off)
    assert "OFFSET 3" in sql and "LIMIT 5" in sql

    rng = spark.range(5, 50, 3).select((F.col("id") * 2).alias("x"))
    assert "range(5, 50, 3)" in _assert_roundtrip(spark, rng)


def test_duckdb_dialect_range(spark):
    import duckdb

    rng = spark.range(0, 10).select((F.col("id") + 1).alias("x"))
    sql = to_sql(rng, DUCKDB)
    got = sorted(v for (v,) in duckdb.sql(sql).fetchall())
    assert got == [r.x for r in rng.orderBy("x").collect()]


def test_registry_unparse_sweep(spark):
    """Robustness sweep mirroring the reference's roundtrip_statement
    battery: a deterministic sample of registry entries (every 23rd by
    sorted name) is unparsed.  Every outcome must be either an exact
    round-trip (same rows from the emitted SQL) or a clean DialectError
    refusal — never a crash, never a silent divergence."""
    import math

    from datafusion_spark.queries import QUERIES

    names = sorted(QUERIES)[::23]
    outcomes = {"roundtrip": 0, "refused": 0}
    for name in names:
        try:
            df = QUERIES[name](spark, SF_SMALL)
        except Exception:
            continue  # entries needing env/scratch state not built here
        try:
            sql = to_sql(df)
        except DialectError:
            outcomes["refused"] += 1
            continue
        # None is not orderable against str/int — sort by a None-aware key
        key = lambda r: [(v is None, repr(v)) for v in r]  # noqa: E731
        got = sorted(map(tuple, spark.sql(sql).collect()), key=key)
        want = sorted(map(tuple, df.collect()), key=key)
        assert len(got) == len(want), f"{name}: row count diverged\n{sql}"
        for g, w in zip(got, want):
            for gv, wv in zip(g, w):
                if isinstance(gv, float) and isinstance(wv, float):
                    ok = (gv == wv or (math.isnan(gv) and math.isnan(wv))
                          or abs(gv - wv) <= 1e-9 * max(abs(gv), abs(wv)))
                    assert ok, f"{name}: value diverged {gv} vs {wv}\n{sql}"
                else:
                    assert gv == wv, f"{name}: {gv!r} != {wv!r}\n{sql}"
        outcomes["roundtrip"] += 1
    # the sweep must exercise both paths to be meaningful
    assert outcomes["roundtrip"] >= 3, outcomes
    assert outcomes["refused"] >= 1, outcomes


def test_compat_dataframe_logical_plan_sql(spark):
    """The compat verb surface exposes the unparser as
    df.logical_plan_sql() — the reference user's
    plan_to_sql(df.logical_plan()) collapsed to one call."""
    import datafusion_spark.compat  # noqa: F401 - installs the verbs

    df = _orders(spark).filter(F.col("o_orderkey") < 50).select("o_orderkey")
    sql = df.logical_plan_sql()
    assert sorted(r[0] for r in spark.sql(sql).collect()) == \
        sorted(r[0] for r in df.collect())


# --- verb-chain fuzz: random DataFrame pipelines must round-trip or refuse --
# Mirrors how the reference fuzzes its own components (core/tests/
# fuzz_cases): hypothesis composes random verb chains over orders(+lineitem)
# and every emitted SQL must reproduce the original rows exactly.

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# thunks: building a Column requires an active SparkContext, which does
# not exist at collection time
_UF_FILTERS = [
    lambda: F.col("o_totalprice") > 50000.0,
    lambda: F.col("o_orderstatus") == "F",
    lambda: F.col("o_orderkey") % 7 == 3,
    lambda: F.col("o_custkey").between(100, 900),
]
_UF_KEYS = ["o_orderstatus", "o_orderpriority"]


@st.composite
def _verb_chain(draw):
    return dict(
        filt=draw(st.lists(st.integers(0, len(_UF_FILTERS) - 1),
                           max_size=2, unique=True)),
        do_join=draw(st.booleans()),
        shape=draw(st.sampled_from(["project", "aggregate"])),
        distinct=draw(st.booleans()),
        sort_limit=draw(st.booleans()),
    )


@given(_verb_chain())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_verb_chains_roundtrip(spark, spec):
    df = _orders(spark)
    for i in spec["filt"]:
        df = df.filter(_UF_FILTERS[i]())
    if spec["do_join"]:
        li = _li(spark).filter(F.col("l_quantity") < 20)
        df = df.join(li, df.o_orderkey == li.l_orderkey)
    if spec["shape"] == "aggregate":
        df = df.groupBy(*_UF_KEYS).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double").alias("total"),
            F.min("o_orderkey").alias("min_key"))
        cols = _UF_KEYS + ["n", "total", "min_key"]
    else:
        df = df.select("o_orderkey", "o_orderstatus",
                       (F.col("o_totalprice") * 2).alias("p2"))
        cols = ["o_orderkey"]
    if spec["distinct"]:
        df = df.distinct()
    if spec["sort_limit"]:
        df = df.orderBy(*cols).limit(40)
    try:
        sql = to_sql(df)
    except DialectError:
        return  # clean refusal is a legal outcome
    key = lambda r: [(v is None, repr(v)) for v in r]  # noqa: E731
    got = sorted(map(tuple, spark.sql(sql).collect()), key=key)
    want = sorted(map(tuple, df.collect()), key=key)
    assert got == want, f"verb-chain roundtrip diverged:\n{sql}"


def test_expr_to_sql(spark):
    """Single-expression unparse (reference expr_to_sql): a Column renders
    to SQL text usable in selectExpr; lossy renderings refuse."""
    from datafusion_spark.compat.unparser import expr_to_sql

    li = _li(spark)
    txt = expr_to_sql(li, (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .alias("net"))
    got = li.selectExpr(txt).limit(5).collect()
    want = li.select((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                     .alias("net")).limit(5).collect()
    assert [r.net for r in got] == [r.net for r in want]
    with pytest.raises(DialectError):
        expr_to_sql(li, F.first("l_quantity", ignorenulls=True))


def test_non_commuting_clause_flushes(spark):
    """r8 review regression pins: clause pairs that do NOT commute inside
    one SQL block must flush to a derived table.  Each case previously
    unparsed to text with identical schema but different ROWS (passing
    the schema-only validate), violating the round-trip contract."""
    o = _orders(spark)
    small = o.select((F.col("o_orderkey") % 2).alias("a"),
                     (F.col("o_custkey") % 3).alias("b")).limit(40)
    # limit-then-offset: LIMIT 5 OFFSET 3 in one block means the reverse
    df = o.select("o_orderkey").orderBy("o_orderkey").limit(5).offset(3)
    _assert_roundtrip(spark, df)
    # aggregate over distinct: GROUP BY must see the deduped rows
    _assert_roundtrip(
        spark, small.distinct().groupBy("a").agg(F.count("*").alias("n")))
    # project over whole-row distinct: SELECT DISTINCT a would narrow it
    _assert_roundtrip(spark, small.distinct().select("a"))
    # filter after offset: WHERE runs before OFFSET in a block
    _assert_roundtrip(
        spark,
        o.select("o_orderkey").orderBy("o_orderkey").offset(3)
         .filter(F.col("o_orderkey") % 2 == 0).limit(7))
    # distinct after offset: DISTINCT runs before OFFSET in a block
    _assert_roundtrip(
        spark, small.select("a", "b").orderBy("a", "b").offset(5).distinct())
    # offset-then-limit still merges into one block (the commuting order)
    sql = to_sql(
        o.select("o_orderkey").orderBy("o_orderkey").offset(3).limit(5))
    assert "LIMIT 5 OFFSET 3" in sql


def test_requote_and_literal_marker_hardening(spark):
    """r8 review pins: (1) an identifier containing a backtick must be
    REFUSED in a non-backtick dialect, not silently rewritten; (2)
    refusal markers must not fire on string-literal content."""
    o = _orders(spark)
    with pytest.raises(DialectError, match="backtick"):
        to_sql(o.select(F.col("o_orderkey").alias("x`y")), DUCKDB,
               validate=False)
    # marker text inside a literal is fine...
    df = o.select(F.lit("call exists(now)").alias("s"), "o_orderkey").limit(3)
    _assert_roundtrip(spark, df)
    # ...and a real HOF exists(...) now ROUND-TRIPS via the r9 lambda
    # rewrite (it used to refuse via the exists( marker)
    arr = o.select(F.array(F.col("o_orderkey")).alias("xs"), "o_orderkey")
    hof = arr.select(F.expr("exists(xs, x -> x > 0)").alias("p"),
                     "o_orderkey").limit(5)
    assert "-> " in _assert_roundtrip(spark, hof)


# --- r9 extensions: CTE/WITH, subquery expressions, LATERAL VIEW, ----------
# one-row SELECT, cost-only directive unwrapping (reference plan.rs CTE
# reconstruction + expr.rs subquery rendering).


def _v(spark, name="uli_v"):
    _li(spark).createOrReplaceTempView(name)
    return name


def test_cte_roundtrip(spark):
    v = _v(spark)
    df = spark.sql(f"""
        WITH a AS (SELECT l_orderkey AS k, l_quantity AS q FROM {v}
                   WHERE l_quantity < 10),
             b AS (SELECT k, SUM(q) AS s FROM a GROUP BY k)
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(s) AS t FROM b
    """)
    sql = _assert_roundtrip(spark, df)
    assert "WITH `a` AS" in sql and "`b` AS" in sql


def test_cte_chain_order_limit(spark):
    df = spark.sql("""
        WITH a AS (SELECT 1 AS x UNION ALL SELECT 2),
             b AS (SELECT x + 1 AS y FROM a)
        SELECT * FROM b ORDER BY y LIMIT 3
    """)
    _assert_roundtrip(spark, df)


def test_scalar_subquery_roundtrip(spark):
    v = _v(spark)
    df = spark.sql(f"""
        SELECT l_orderkey FROM {v}
        WHERE l_quantity > (SELECT AVG(l_quantity) FROM {v})
          AND l_orderkey < 100
    """)
    sql = _assert_roundtrip(spark, df)
    assert "(select avg(" in sql.lower().replace("`", "")


def test_in_and_not_in_subquery_roundtrip(spark):
    v = _v(spark)
    df = spark.sql(f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {v}
        WHERE l_orderkey IN (SELECT l_orderkey FROM {v} WHERE l_quantity < 3)
    """)
    assert " IN (SELECT" in _assert_roundtrip(spark, df)
    df2 = spark.sql(f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {v}
        WHERE l_orderkey NOT IN
              (SELECT l_orderkey FROM {v} WHERE l_quantity < 3)
          AND l_linenumber = 1
    """)
    _assert_roundtrip(spark, df2)


def test_scalar_subquery_in_projection(spark):
    v = _v(spark)
    df = spark.sql(f"""
        SELECT l_returnflag,
               CAST((SELECT MAX(l_quantity) FROM {v}) AS INT) AS mx
        FROM {v} GROUP BY l_returnflag
    """)
    _assert_roundtrip(spark, df)


def test_correlated_subquery_roundtrip(spark):
    """r10: correlated subqueries unparse by unwrapping Catalyst's
    outer(q.name) rendering into the bare correlated reference (the
    reference unparser renders these as plain column refs).  Both the
    EXISTS and scalar forms must round-trip row-identically; the
    refusal guards (unqualified outer ref / hidden qualifier) are
    covered by the registry sweep's refusal classes."""
    v = _v(spark)
    df = spark.sql(f"""
        SELECT l_returnflag FROM {v} t
        WHERE EXISTS (SELECT 1 FROM {v} u
                      WHERE u.l_orderkey = t.l_orderkey
                        AND u.l_quantity > 49)
    """)
    sql = _assert_roundtrip(spark, df)
    assert "EXISTS" in sql and "outer(" not in sql
    df2 = spark.sql(f"""
        SELECT l_orderkey, l_quantity FROM {v} t
        WHERE l_quantity > (SELECT AVG(u.l_quantity) FROM {v} u
                            WHERE u.l_orderkey = t.l_orderkey) + 1
    """)
    _assert_roundtrip(spark, df2)


def test_lateral_view_roundtrip(spark):
    v = _v(spark)
    df = spark.sql(f"""
        SELECT l_orderkey, v FROM {v}
        LATERAL VIEW explode(sequence(1, l_linenumber)) g AS v
        WHERE l_orderkey < 30
    """)
    sql = _assert_roundtrip(spark, df)
    assert "LATERAL VIEW explode(" in sql
    # OUTER + aggregate above the generate
    df2 = spark.sql(f"""
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM {v}
        LATERAL VIEW OUTER explode(
            CASE WHEN l_quantity > 45 THEN sequence(1, 2) END) g AS v
        GROUP BY l_returnflag
    """)
    assert "LATERAL VIEW OUTER" in _assert_roundtrip(spark, df2)


def test_posexplode_verb_roundtrip(spark):
    df = (_li(spark).filter("l_orderkey < 30")
          .select("l_orderkey",
                  F.posexplode(F.sequence(F.lit(1), "l_linenumber"))))
    _assert_roundtrip(spark, df)


def test_one_row_select_roundtrip(spark):
    df = spark.sql("SELECT 1 + 1 AS a, upper('x') AS b")
    sql = _assert_roundtrip(spark, df)
    assert "FROM" not in sql
    # explode over the one-row relation needs the dummy-factor path
    df2 = spark.sql("SELECT explode(array(1, 2, 3)) AS v")
    _assert_roundtrip(spark, df2)


def test_hint_and_repartition_are_cost_only(spark):
    li, o = _li(spark), _orders(spark)
    df = (li.repartition(4)
          .join(F.broadcast(o.filter("o_orderkey < 50")),
                li.l_orderkey == o.o_orderkey)
          .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))
    sql = _assert_roundtrip(spark, df)
    # the hint/repartition leave no residue in the text
    assert "broadcast" not in sql.lower() and "repartition" not in sql.lower()


def test_cte_plus_scalar_subquery(spark):
    v = _v(spark)
    df = spark.sql(f"""
        WITH th AS (SELECT AVG(l_quantity) AS a FROM {v})
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {v}
        WHERE l_quantity > (SELECT a FROM th)
    """)
    _assert_roundtrip(spark, df)


def test_complex_cast_drop_repaired(spark):
    """Pinned Catalyst rendering bug (5th silent-arg-drop class, found by
    the r9 registry sweep): Expression.sql renders a CAST to a COMPLEX
    type as just its child — CAST(array(1,2) AS ARRAY<DOUBLE>) prints
    'array(1, 2)' — so the re-parse silently computes integer elements
    ('1,2' instead of '1.0,2.0' through array_join).  REPAIRED (r10,
    same protocol as the struct-name repair): the lossy render's unique
    occurrence is wrapped back into an explicit CAST from the tree's
    target type; an ambiguous multi-occurrence anchor refuses."""
    df = spark.sql(
        "SELECT array_join(CAST(array(1,2) AS ARRAY<DOUBLE>), ',') AS c")
    sql = _assert_roundtrip(spark, df)
    assert "CAST(array(1, 2) AS ARRAY<DOUBLE>)" in sql
    assert df.collect()[0].c == "1.0,2.0"
    # anchoring is per-EXPRESSION: a sibling column with the same un-cast
    # spelling repairs independently and still round-trips
    two = spark.sql(
        "SELECT array_join(CAST(array(1,2) AS ARRAY<DOUBLE>), ',') AS c, "
        "array(1,2) AS raw")
    assert "AS ARRAY<DOUBLE>)" in _assert_roundtrip(spark, two)
    # the same child spelling appearing UN-cast INSIDE one expression →
    # ambiguous anchor, refuse rather than guess which occurrence
    amb = spark.sql(
        "SELECT concat(array_join(CAST(array(1,2) AS ARRAY<DOUBLE>), ','),"
        " '|', array_join(array(1,2), ',')) AS c")
    with pytest.raises(DialectError,
                       match="complex-type CAST|not uniquely anchorable"):
        to_sql(amb)
    # scalar casts render correctly and keep round-tripping
    _assert_roundtrip(
        spark, spark.sql("SELECT CAST(1 AS DOUBLE) AS x, CAST('7' AS INT) AS y"))


def test_same_name_equi_join_renders_using(spark):
    """df.join(other, "key") equi-joins same-named unqualified attributes;
    an ON clause would render the key ambiguous (both factors expose it),
    so the unparser emits USING — which also matches Catalyst's key-dedup
    output shape."""
    li = _li(spark).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q"))
    o = _orders(spark).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    df = (li.join(o, "l_orderkey")
          .groupBy("o_orderpriority").agg(F.sum("q").alias("tq")))
    sql = _assert_roundtrip(spark, df)
    assert "USING (`l_orderkey`)" in sql


def test_inline_values_roundtrip(spark):
    """LocalRelation (spark.sql VALUES / resolved inline tables) renders
    as a VALUES table factor with typed literals — incl. the long-backed
    cells py4j narrows (bigint, timestamp)."""
    df = spark.sql("""
        SELECT i * 2 AS ii, s, b + 1 AS b1, dt, dec FROM VALUES
          (1, 'a', CAST(5 AS BIGINT), DATE '2020-01-02',
           CAST(1.5 AS DECIMAL(5,2))),
          (2, 'b', CAST(9223372036854775806 AS BIGINT), NULL, NULL)
          AS t(i, s, b, dt, dec)
    """)
    sql = _assert_roundtrip(spark, df)
    assert "VALUES" in sql and "DATE '2020-01-02'" in sql
    # empty inline relation: typed empty table via WHERE false
    e = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM "
                  "(SELECT * FROM VALUES (1) t(v) WHERE false)")
    sql2 = to_sql(e)
    got = spark.sql(sql2).collect()[0]
    assert (got.n, got.s) == (0, None)


def test_subquery_under_case_between_in(spark):
    """Scalar subqueries reachable through CASE WHEN / BETWEEN / IN-list
    spines render via the recursive path (the tpcds q9/q54/q14b shapes)."""
    v = _v(spark)
    df = spark.sql(f"""
        SELECT CASE WHEN (SELECT COUNT(*) FROM {v} WHERE l_quantity > 40)
                         > 10
                    THEN (SELECT AVG(l_quantity) FROM {v})
                    ELSE 0.0 END AS pick,
               CAST((SELECT MIN(l_orderkey) FROM {v}) AS INT)
                 BETWEEN 0 AND 10 AS lo,
               1 IN (1, (SELECT CAST(MAX(l_linenumber) AS INT) FROM {v}))
                 AS inlist
    """)
    _assert_roundtrip(spark, df)


def test_grouping_sets_reconstruction(spark):
    """Aggregate(Expand) reconstructs GROUP BY GROUPING SETS, including
    grouping()/grouping_id() outputs rewritten back from their exact
    spark_grouping_id lowerings."""
    v = _v(spark)
    df = spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               grouping_id() AS gid
        FROM {v}
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """)
    sql = to_sql(df)
    # grouping_id renders with explicit args (r10: DuckDB requires them;
    # Spark re-lowers the explicit form identically)
    assert "GROUPING SETS" in sql and "grouping(" in sql \
        and "grouping_id(" in sql
    key = lambda r: [(v is None, repr(v)) for v in r]  # noqa: E731
    a = sorted(map(tuple, df.collect()), key=key)
    b = sorted(map(tuple, spark.sql(sql).collect()), key=key)
    assert a == b and a
    cube = spark.sql(f"""
        SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS q
        FROM {v} GROUP BY CUBE(l_returnflag, l_linestatus)
    """)
    sql2 = to_sql(cube)
    assert "GROUPING SETS" in sql2
    a2 = sorted(map(tuple, cube.collect()), key=key)
    b2 = sorted(map(tuple, spark.sql(sql2).collect()), key=key)
    assert a2 == b2 and a2
    # computed grouping expressions still refuse cleanly
    comp = spark.sql(f"""
        SELECT length(l_returnflag) AS lr, COUNT(*) AS n
        FROM {v} GROUP BY ROLLUP(length(l_returnflag))
    """)
    with pytest.raises(DialectError, match="computed grouping-set"):
        to_sql(comp)


def test_observe_is_cost_only(spark):
    """df.observe() (CollectMetrics) is an identity over rows — unwraps
    without residue like hints/repartition."""
    df = (_li(spark).observe("m", F.count(F.lit(1)).alias("cnt"))
          .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))
    _assert_roundtrip(spark, df)


def test_lambda_hof_roundtrips(spark):
    """Higher-order-function lambdas re-render as arrow syntax from the
    tree: single-var (transform/filter/exists), two-var (zip_with,
    aggregate's acc/x), and sibling lambdas in one expression."""
    v = _v(spark)
    df = spark.sql(f"""
        SELECT l_orderkey,
               aggregate(sequence(1, l_linenumber), 0L,
                         (acc, x) -> acc + x * 2) AS agg2,
               size(filter(sequence(1, l_linenumber),
                           x -> x % 2 = 0)) AS n_even,
               transform(sequence(1, 3), x -> x * l_linenumber) AS scaled,
               zip_with(sequence(1, 3), sequence(4, 6),
                        (a, b) -> a * b) AS zw
        FROM {v} WHERE l_orderkey < 30
    """)
    sql = to_sql(df)
    assert "lambdafunction" not in sql and "-> " in sql
    key = lambda r: repr(r)  # noqa: E731 - arrays aren't orderable
    a = sorted(map(tuple, df.collect()), key=key)
    b = sorted(map(tuple, spark.sql(sql).collect()), key=key)
    assert a == b and a
    # a lambda variable named like a column still binds lexically
    df2 = spark.sql(f"""
        SELECT SUM(aggregate(sequence(1, 3), 0L,
                   (l_orderkey, x) -> l_orderkey + x)) AS s
        FROM {v}
    """)
    a2 = df2.collect()
    b2 = spark.sql(to_sql(df2)).collect()
    assert [tuple(r) for r in a2] == [tuple(r) for r in b2]
    # string literal containing the internal token must not corrupt the
    # rewrite (occurrence-count misalignment refuses instead)
    df3 = spark.sql(
        "SELECT transform(array('a'), x -> "
        "concat(x, 'namedlambdavariable()')) AS t")
    try:
        sql3 = to_sql(df3)
        assert sorted(map(repr, spark.sql(sql3).collect())) == \
            sorted(map(repr, df3.collect()))
    except DialectError:
        pass  # clean refusal is also acceptable — never silent corruption


def test_duckdb_bare_scan_join_aliases(spark):
    """r9 judge repro: a join whose sides are BARE file scans must alias
    each read_parquet factor — DuckDB names an unaliased factor after
    the function, so two of them binder-error with 'Duplicate alias'."""
    import duckdb

    li = _li(spark).select("l_orderkey", "l_quantity")
    o = _orders(spark).select("o_orderkey", "o_orderpriority")
    df = (li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy("o_orderpriority")
          .agg(F.count(F.lit(1)).alias("n")))
    sql = to_sql(df, DUCKDB)
    assert sql.count("read_parquet(") == 2
    got = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    want = sorted(map(tuple, df.collect()))
    assert got == want and got


def test_using_join_at_root_keeps_schema(spark):
    """r9 advice find: a same-named equi-join with NO parent projection
    renders USING, whose SELECT * dedups/reorders the key — the emitted
    text must materialize the Join node's own 2-sided schema instead."""
    li = (_li(spark).groupBy("l_orderkey").agg(F.sum("l_quantity")
          .cast("double").alias("q")))
    o = _orders(spark).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    df = li.join(o, li.l_orderkey == o.l_orderkey)  # Join IS the root
    sql = to_sql(df)  # validate=True enforces schema parity
    assert "USING" in sql
    re_df = spark.sql(sql)
    assert re_df.columns == df.columns  # both key columns, in position
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, re_df.collect()))
    assert a == b and a
    # ... and both USING-shaped set-op branches keep full arity
    u = df.unionAll(df)
    sql_u = to_sql(u)
    assert sorted(map(tuple, spark.sql(sql_u).collect())) == \
        sorted(map(tuple, u.collect()))


def test_using_join_same_nonkey_names_refuse(spark):
    """Same-named NON-key columns on both USING sides are unresolvable
    on re-parse — refuse rather than emit ambiguous text."""
    a = spark.range(3).select("id", F.lit(1).alias("v"))
    b = spark.range(3).select("id", F.lit(2).alias("v"))
    with pytest.raises(DialectError):
        to_sql(a.join(b, a.id == b.id))


def test_regroup_literal_protection(spark):
    """r9 advice find: _regroup's rewrites must not fire inside string
    literals — a literal containing 'spark_grouping_id' survives."""
    v = _v(spark)
    df = spark.sql(f"""
        SELECT n_regionkey,
               concat('spark_grouping_id=', CAST(COUNT(*) AS STRING)) AS t
        FROM (SELECT l_orderkey %% 3 AS n_regionkey FROM {v})
        GROUP BY GROUPING SETS ((n_regionkey), ())
    """.replace("%%", "%"))
    sql = to_sql(df)
    assert "'spark_grouping_id='" in sql
    a = sorted(map(tuple, df.collect()), key=repr)
    b = sorted(map(tuple, spark.sql(sql).collect()), key=repr)
    assert a == b and a


def test_lambda_var_shadowing_column(spark):
    """r9 advice find: a real column literally named lv1 referenced
    inside a lambda body must not be captured by the generated arrow
    variable — the unparser picks a non-colliding fresh name."""
    df = (spark.range(1, 4)
          .select(F.col("id").alias("lv1"),
                  F.array(F.col("id") * 10).alias("arr"))
          .select("lv1",
                  F.transform("arr", lambda x: x + F.col("lv1"))
                  .alias("y")))
    sql = to_sql(df)
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, spark.sql(sql).collect()))
    assert a == b and a


def test_ltz_timestamp_non_utc_session(spark):
    """r9 advice find: LocalRelation TIMESTAMP (LTZ) cells must render
    the SESSION-timezone wall time (Spark parses TIMESTAMP literals in
    the session zone), not blindly the UTC wall time."""
    df = spark.sql(
        "SELECT ts, v FROM VALUES (TIMESTAMP '2021-06-01 12:00:00', 1) "
        "AS t(ts, v)")
    tz_key = "spark.sql.session.timeZone"
    spark.conf.set(tz_key, "America/New_York")
    try:
        sql = to_sql(df)
        a = [tuple(r) for r in df.collect()]
        b = [tuple(r) for r in spark.sql(sql).collect()]
        assert a == b and a
    finally:
        spark.conf.set(tz_key, "UTC")


def test_backslash_and_quote_literals(spark):
    """r10 exec-pass find: Catalyst renders string literals C-style
    (backslash doubled, quote as \\'), which the quote-aware walks must
    parse — and the DuckDB dialect must re-escape to standard SQL
    (backslash literal, quote doubled).  Covers the LIKE default-escape
    divergence too (Spark's LIKE escape char is backslash, DuckDB has
    none without an ESCAPE clause)."""
    import duckdb

    df = (_li(spark).limit(0)  # schema only; rows come from the VALUES
          .select("l_orderkey"))
    df = spark.sql(r"""
        SELECT s, s LIKE '%\\_x' AS m, 'it''s' AS q
        FROM VALUES ('a_x'), ('a\\_x') AS t(s)
    """)
    sql = to_sql(df)                      # spark round-trip
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spark.sql(sql).collect()))
    assert a == b and a
    dsql = to_sql(df, DUCKDB, validate=False)
    got = sorted(map(tuple, duckdb.sql(dsql).fetchall()))
    assert got == a                       # escape + re-quoting exact
    assert "it''s" in dsql          # quote re-doubled for DuckDB
    assert "ESCAPE" in dsql         # LIKE default-escape made explicit


# --- r10 DuckDB-execution translation batch -------------------------------
# Each translation below was probed for semantic equivalence in DuckDB
# before being added to _DUCKDB_FN_RULES; these tests pin the emitted
# text's VALUES on both engines (the failure class that matters is a
# silent cross-engine divergence, so every test executes the DuckDB text).


def _duck_rows(dsql):
    import duckdb

    return sorted(map(repr, map(tuple, duckdb.sql(dsql).fetchall())))


def _both(spark, df):
    dsql = to_sql(df, DUCKDB, validate=False)
    a = sorted(map(repr, map(tuple, df.collect())))
    assert a, "test must not be vacuous"
    assert _duck_rows(dsql) == a, f"cross-engine divergence for:\n{dsql}"
    return dsql


def test_duckdb_xor_and_bitwise(spark):
    """Spark ^ is XOR; DuckDB ^ is POWER (exec-pass find) — the same
    spelling silently computes a different value, so ^ groups rewrite
    to xor()."""
    df = spark.sql("SELECT (x ^ 12) AS a, ((x ^ 3) ^ (x ^ 5)) AS b, "
                   "(x & 6) AS c, (x | 9) AS d "
                   "FROM VALUES (1), (7) AS t(x)")
    dsql = _both(spark, df)
    assert "xor(" in dsql and "^" not in dsql


def test_duckdb_concat_null_propagation(spark):
    """DuckDB concat() SKIPS NULL args (Postgres), Spark concat is NULL
    on any NULL arg (exec-pass find) — translate through || which
    propagates NULL identically in both engines."""
    df = spark.sql("SELECT concat(s, 'x') AS c1, concat(s, s, 'y') AS c2 "
                   "FROM VALUES ('a'), (CAST(NULL AS STRING)) AS t(s)")
    _both(spark, df)


def test_duckdb_negative_frame_bounds(spark):
    """Spark accepts -3 FOLLOWING (≡ 3 PRECEDING) and Catalyst renders
    the minus literally; DuckDB rejects it loudly — bounds flip."""
    w = (Window.partitionBy("l_suppkey")
         .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
         .rowsBetween(-3, 0))
    df = (_li(spark).filter(F.col("l_suppkey") <= 3)
          .select("l_orderkey", "l_linenumber",
                  F.sum("l_quantity").over(w).alias("s4")))
    dsql = _both(spark, df)
    assert "3 PRECEDING" in dsql and "FOLLOWING AND" not in dsql


def test_duckdb_map_and_struct_surface(spark):
    """Map subscripts return value-or-NULL in Spark but a 0/1-element
    LIST in DuckDB (the appended [1] restores value semantics);
    struct()/named_struct() render as struct_pack with Spark's field
    naming; raw integer subscripts refuse (0- vs 1-based)."""
    df = spark.sql(
        "SELECT map_from_arrays(array('k'), array(x))['k'] AS hit, "
        "map_from_arrays(array('k'), array(x))['z'] AS miss, "
        "named_struct('a', x, 'b', 'c').a AS fld, "
        "element_at(array(x, x + 1), -1) AS last_el "
        "FROM VALUES (1), (2) AS t(x)")
    _both(spark, df)
    bad = spark.sql("SELECT array(x, 1)[0] AS first FROM VALUES (5) AS t(x)")
    with pytest.raises(DialectError):
        to_sql(bad, DUCKDB, validate=False)


def test_duckdb_fold_and_zip_with(spark):
    """aggregate() folds via list_reduce(list_prepend(init, arr)) with a
    NULL-array guard; zip_with zips through list_zip positional structs.
    A fold whose merge CASTS the element refuses: list_prepend unifies
    the element type with the accumulator's and pre-rounds it
    (exec-pass divergence find)."""
    df = spark.sql(
        "SELECT aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) "
        "AS s, zip_with(a, b, (x, y) -> x * y) AS z, "
        "size(filter(a, v -> v > 1.0)) AS n "
        "FROM VALUES (array(1.0D, 2.0D), array(3.0D, 4.0D)), "
        "(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS t(a, b)")
    _both(spark, df)
    mixing = spark.sql(
        "SELECT aggregate(a, CAST(0 AS DECIMAL(20,8)), "
        "(acc, v) -> CAST(acc + CAST(v AS DECIMAL(20,8)) AS DECIMAL(20,8)))"
        " AS s FROM VALUES (array(1.5D)) AS t(a)")
    with pytest.raises(DialectError):
        to_sql(mixing, DUCKDB, validate=False)


def test_duckdb_collect_and_sort_translations(spark):
    """collect_list→list / collect_set→list(DISTINCT ...) with the
    Catalyst default array_sort comparator recognized as plain
    list_sort (asc NULLS LAST in both engines)."""
    df = spark.sql(
        "SELECT g, array_sort(collect_list(x)) AS xs, "
        "array_sort(collect_set(x)) AS ds, "
        "aggregate(collect_list(CAST(x AS DOUBLE)), 1.0D, "
        "(a, b) -> a * b) AS prod "
        "FROM VALUES (1, 3), (1, 1), (1, 3), (2, 2) AS t(g, x) GROUP BY g")
    _both(spark, df)


def test_duckdb_grouping_id_explicit_args(spark):
    """grouping_id() renders with explicit grouping columns — required
    by DuckDB, re-lowered identically by Spark."""
    df = spark.sql(
        "SELECT l_returnflag, l_linestatus, grouping_id() AS gid, "
        "count(1) AS n FROM parquet.`{}/lineitem.parquet` "
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), "
        "(l_returnflag), ())".format(SF_SMALL))
    sql = to_sql(df)                        # Spark dialect still exact
    a = sorted(map(repr, map(tuple, df.collect())))
    b = sorted(map(repr, map(tuple, spark.sql(sql).collect())))
    assert a == b and a
    assert "grouping_id(l_returnflag, l_linestatus)" in sql
    _both(spark, df)                        # and DuckDB executes it


def test_duckdb_misc_function_batch(spark):
    """One-line spellings probed and pinned: percentile→quantile_cont,
    sha2-256→sha256, md5 binary-cast strip, div→//, <=> → IS NOT
    DISTINCT FROM, typed-literal suffixes, date_format pattern map."""
    df = spark.sql(
        "SELECT percentile(x, 0.5) AS p50, "
        "count(CASE WHEN (x <=> NULL) THEN 1 END) AS nsafe "
        "FROM VALUES (1), (2), (3) AS t(x)")
    _both(spark, df)
    df2 = spark.sql(
        "SELECT md5(s) AS h1, sha2(s, 256) AS h2, x div 2 AS d, "
        "CAST(CAST(1E-7BD AS DECIMAL(12,7)) AS DOUBLE) AS tiny, "
        "date_format(TIMESTAMP '2020-01-05 13:07:09', "
        "'yyyy-MM-dd HH:mm:ss') AS fmt "
        "FROM VALUES ('ab', 7), ('cd', -7) AS t(s, x)")
    dsql = _both(spark, df2)
    assert "//" in dsql and "quantile_cont" not in dsql


def test_duckdb_timestampadd_and_intervals(spark):
    df = spark.sql(
        "SELECT timestampadd(HOUR, n, TIMESTAMP '2020-01-01 00:00:00') "
        "AS th, date_add(DATE '2020-02-27', n) AS da, "
        "datediff(DATE '2020-03-01', DATE '2020-01-01') AS dd "
        "FROM VALUES (1), (3) AS t(n)")
    _both(spark, df)


def test_struct_alias_name_drop_repair(spark):
    """SIXTH Catalyst silent-arg-drop class (r10): struct(x AS w1).sql()
    renders 'struct(x)' — the aliased field NAME is gone and the
    re-parse renames the nested field (values identical, schema drifts).
    The unparser repairs the render to named_struct('w1', x) when the
    lossy spelling occurs in the text, and refuses when it is hidden
    inside a lambda body (variable substitution makes the repair
    unanchorable)."""
    df = spark.sql("SELECT struct(c1 AS w1, c1 + 1 AS w2) AS s, "
                   "struct(c1 AS w1).w1 AS v FROM VALUES (1), (2) t(c1)")
    sql = to_sql(df, validate=False)
    assert "named_struct('w1'" in sql
    re_df = spark.sql(sql)
    assert re_df.schema == df.schema          # nested names survive
    a = sorted(map(repr, map(tuple, df.collect())))
    b = sorted(map(repr, map(tuple, re_df.collect())))
    assert a == b and a
    lam = spark.sql(
        "SELECT transform(array(1, 2), x -> struct(x AS w1)) AS a")
    with pytest.raises(DialectError):
        to_sql(lam, validate=False)
    # natural names (no alias) keep the plain struct render
    plain = spark.sql("SELECT struct(c1) AS s FROM VALUES (3) t(c1)")
    assert "named_struct" not in to_sql(plain, validate=False)


def test_duckdb_reverse_list_vs_string(spark):
    """Spark reverse() is string- AND array-polymorphic; DuckDB's is
    VARCHAR-only (exec-pass find: reverse(BIGINT[]) binder error).  A
    provably-list head translates to list_reverse; a string head stays
    reverse() — both executed and value-compared."""
    df = spark.sql(
        "SELECT reverse(sort_array(collect_list(x))) AS r, "
        "reverse(min(s)) AS rs "
        "FROM VALUES (1, 'ab'), (3, 'cd'), (2, 'ee') AS t(x, s)")
    dsql = to_sql(df, DUCKDB, validate=False)
    assert "list_reverse(" in dsql and "reverse(min(" in dsql
    got = [(list(r[0]), r[1]) for r in df.collect()]
    import duckdb
    want = [(list(r[0]), r[1]) for r in duckdb.sql(dsql).fetchall()]
    assert got == want == [([3, 2, 1], "ba")]


def test_duckdb_long_min_literal(spark):
    """Long.MinValue renders as -9223372036854775808L; splitting the
    minus out of the CAST makes the positive magnitude overflow at the
    DuckDB binder (INT128 -> INT64 conversion error, exec-pass find on
    fn_edge_in_list_typed) — the minus moves inside the CAST."""
    df = spark.sql(
        "SELECT (x IN (CAST(1 AS BIGINT), -9223372036854775808L)) AS hit "
        "FROM VALUES (CAST(-9223372036854775808 AS BIGINT)), "
        "(CAST(5 AS BIGINT)) AS t(x)")
    dsql = _both(spark, df)
    assert "CAST(-9223372036854775808 AS BIGINT)" in dsql


def test_duckdb_numeric_timestamp_cast_refuses(spark):
    """Spark CAST(numeric AS TIMESTAMP) / CAST(ts AS BIGINT) is epoch-
    seconds semantics; DuckDB has no such cast ("Unimplemented type for
    cast", exec-pass find) and the operand type is invisible in text —
    refused from the tree in the DUCKDB dialect, exact in Spark."""
    df = spark.sql("SELECT CAST(1700000000 AS TIMESTAMP) AS ts")
    _assert_roundtrip(spark, df.selectExpr("CAST(ts AS STRING) AS s"))
    with pytest.raises(DialectError, match="epoch-seconds"):
        to_sql(df, DUCKDB, validate=False)
    df2 = _orders(spark).select(
        F.col("o_orderdate").cast("timestamp").cast("long").alias("secs"))
    with pytest.raises(DialectError, match="epoch-seconds"):
        to_sql(df2, DUCKDB, validate=False)


def test_duckdb_reverse_of_translated_array(spark):
    """r10 ADVICE: _REVERSE_LIST_HEADS omitted list_value( — the
    unparser's OWN translation of Spark array() (inner args are
    rewritten before the handler runs), so reverse(array(1,2,3))
    emitted reverse(list_value(...)), a DuckDB binder error.  Now
    translates to list_reverse and executes."""
    df = spark.sql("SELECT reverse(array(1, 2, 3)) AS r, "
                   "reverse(slice(array(9, 8, 7), 1, 2)) AS r2")
    dsql = to_sql(df, DUCKDB, validate=False)
    assert "list_reverse(list_value(" in dsql
    assert "list_reverse(list_slice(" in dsql
    import duckdb
    got = [tuple(map(list, r)) for r in df.collect()]
    want = [tuple(map(list, r)) for r in duckdb.sql(dsql).fetchall()]
    assert got == want == [([3, 2, 1], [8, 9])]


def test_split_top_args_bracket_aware():
    """r10 ADVICE: _split_top_args counted the commas inside a bracket
    list literal [1, 2, 3] as argument separators, tripping multi-arg
    refusals before the '[' head in _REVERSE_LIST_HEADS could match."""
    from datafusion_spark.compat.unparser import (_split_top_args,
                                                  _top_level_commas)
    assert _split_top_args("[1, 2, 3]") == ["[1, 2, 3]"]
    assert _top_level_commas("[1, 2, 3]") == 0
    assert _split_top_args("list_value(1, 2), 'a,b', [4, 5]") == [
        "list_value(1, 2)", "'a,b'", "[4, 5]"]


def test_lambda_dropped_cast_refuses(spark):
    """r10 ADVICE: a complex-type CAST dropped by Expression.sql INSIDE
    a lambda body cannot anchor against the lambda-rendered text (the
    render renames lambda variables) — previously silently unrepaired
    when validate=False.  Now: validate=False refuses at the anchor
    check; validate=True defers to the full nested-type round-trip
    check (so analyzer-inserted coercion casts that re-analysis
    re-derives — e.g. agg_array_agg_ordered — still round-trip exact)
    and refuses HERE because the drift is real."""
    df = spark.sql("SELECT transform(array(1, 2), "
                   "x -> CAST(array(x) AS ARRAY<DOUBLE>)) AS t")
    with pytest.raises(DialectError, match="lambda-rendered"):
        to_sql(df, SPARK, validate=False)
    with pytest.raises(DialectError, match="type drift"):
        to_sql(df, SPARK, validate=True)


def test_neg_boundary_binary_minus_guard():
    """r10 ADVICE: _NEG_BOUNDARY_RE had no left guard — a spaced binary
    subtraction 'a - 128Y' would corrupt to 'a CAST(-128 AS TINYINT)'.
    The fixed-width lookbehinds anchor the minus against a preceding
    operand; unary positions still rewrite."""
    from datafusion_spark.compat.unparser import _neg_boundary
    assert _neg_boundary("a - 128Y") == "a - 128Y"
    assert _neg_boundary("a-128Y") == "a-128Y"
    assert _neg_boundary("a + -128Y") == "a + CAST(-128 AS TINYINT)"
    assert _neg_boundary("(-32768S)") == "(CAST(-32768 AS SMALLINT))"
    assert (_neg_boundary("(x, -9223372036854775808L)")
            == "(x, CAST(-9223372036854775808 AS BIGINT))")


def test_schema_fn_arg_drop_repair(spark):
    """The SEVENTH Catalyst silent-arg-drop class (r11 find):
    from_csv/from_json .sql() renders only the input — the SCHEMA
    argument and any options map vanish (re-parse: loud arity error);
    to_json/to_csv drop their options map SILENTLY (default formatting
    — a value divergence).  All recoverable from the tree
    (dataType().sql() is valid DDL; options() carries the map) and
    re-attached at the unique anchor."""
    cases = [
        ("SELECT from_csv('1,a', 'x INT, y STRING') AS m", None),
        ("SELECT from_csv('1;a', 'x INT, y STRING', map('sep', ';')).y"
         " AS y2", "map('sep', ';')"),
        ("SELECT from_json('{\"a\":1}', 'a INT').a AS a", None),
        ("SELECT from_json('[{\"a\":1},{\"a\":2}]',"
         " 'ARRAY<STRUCT<a: INT>>') AS arr", None),
        ("SELECT to_json(named_struct('a', DATE '2024-01-01'),"
         " map('dateFormat', 'dd/MM/yyyy')) AS j",
         "map('dateFormat', 'dd/MM/yyyy')"),
    ]
    for q, frag in cases:
        df = spark.sql(q)
        sql = to_sql(df)
        if frag:
            assert frag in sql, (q, sql)
        a = [tuple(r) for r in df.collect()]
        b = [tuple(r) for r in spark.sql(sql).collect()]
        assert a == b == [tuple(r) for r in df.collect()], (q, sql)
    # DuckDB has no from_csv at all — refused from the tree
    with pytest.raises(DialectError, match="no faithful spelling"):
        to_sql(spark.sql(cases[0][0]), DUCKDB, validate=False)


def test_duckdb_translation_batch_r11(spark):
    """r11 DuckDB translation batch, each executed and value-compared:
    semi/anti joins (DuckDB SEMI/ANTI JOIN spelling), unix_timestamp
    with a Java format (strptime mapping; timestamp operands repaired
    from the tree where Spark ignores the format), regex split
    (string_split / string_split_regex keep trailing empties), RLIKE /
    regexp_extract under the safe-regex gate, fractional→integral CAST
    wrapped in trunc() (Spark truncates, DuckDB rounds), try_cast
    staying TRY_CAST (NULL on overflow), regexp_replace $N backrefs
    rewritten to RE2 \\N, and array_join('') on an empty array."""
    import duckdb

    cases = [
        "SELECT unix_timestamp('2024-03-05 06:07:08',"
        " 'yyyy-MM-dd HH:mm:ss') AS u",
        "SELECT unix_timestamp(TIMESTAMP '2024-03-05 06:07:08',"
        " 'yyyy-MM-dd') AS u",  # ts operand: format IGNORED by Spark
        "SELECT split('a,b,,', ',') AS s, split('a1b22c', '[0-9]+') AS t",
        "SELECT 'xabcy' RLIKE 'abc' AS r",
        "SELECT regexp_extract('ab12cd', '([a-z]+)([0-9]+)', 2) AS g,"
        " regexp_extract('nope', '([0-9]+)', 1) AS miss",
        "SELECT CAST(CAST(382273.9375 AS DOUBLE) AS BIGINT) AS c,"
        " try_cast(1e19 AS BIGINT) AS sat,"
        " CAST(CAST(-2.7 AS DECIMAL(11,1)) AS INT) AS c2",
        "SELECT regexp_replace('http://www.x.com/a',"
        " '^https?://(www.)?([^/]+)/.*$', '$2') AS host",
        "SELECT array_join(regexp_extract_all('no digits', '([0-9]+)', 1),"
        " '|') AS empty_join",
    ]
    for q in cases:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        norm = lambda rows: sorted(
            tuple(list(x) if isinstance(x, list) else x for x in r)
            for r in rows)
        assert norm(df.collect()) == norm(duckdb.sql(sql).fetchall()), (
            q, sql)
    # semi/anti spelling + execution
    li, o = _li(spark), _orders(spark)
    semi = (o.join(li.filter(F.col("l_quantity") > 45),
                   o.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n")))
    sql = to_sql(semi, DUCKDB, validate=False)
    assert " SEMI JOIN " in sql and "LEFT SEMI" not in sql
    import duckdb as dk
    assert sorted(map(tuple, semi.collect())) == \
        sorted(map(tuple, dk.sql(sql).fetchall()))
    # untranslatable classes refuse loudly
    with pytest.raises(DialectError, match="strptime"):
        to_sql(spark.sql("SELECT unix_timestamp('05/Mar/2024',"
                         " 'dd/MMM/yyyy') AS u"), DUCKDB, validate=False)
    with pytest.raises(DialectError, match="Java-only"):
        to_sql(spark.sql(r"SELECT 'ab' RLIKE 'a(?=b)' AS r"),
               DUCKDB, validate=False)
    with pytest.raises(DialectError, match="INTERVAL"):
        to_sql(spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00'"
                         " + INTERVAL '1' DAY * 2.5 AS t"),
               DUCKDB, validate=False)


def test_duckdb_lateral_unnest_explode(spark):
    """r11 ADVICE #4: in-repo coverage for the Generate→DuckDB
    lateral-unnest translation — inner and OUTER explode over NULL and
    empty arrays executed in DuckDB and value-compared (inner drops the
    NULL/empty rows, outer keeps them with a NULL element).  Multi-column
    generators translate as of r12 (test_duckdb_multicolumn_generators);
    stack() remains the pinned refusal."""
    import duckdb

    base = ("VALUES (1, array(10, 20)), (2, array()), "
            "(3, CAST(NULL AS ARRAY<INT>)) AS t(k, xs)")
    for verb, nrows in (("explode", 2), ("explode_outer", 4)):
        df = spark.sql(f"SELECT k, {verb}(xs) AS x FROM {base}")
        sql = to_sql(df, DUCKDB, validate=False)
        assert "unnest(" in sql, sql
        got = sorted(map(tuple, duckdb.sql(sql).fetchall()),
                     key=lambda r: (r[0], r[1] is None, r[1]))
        want = sorted(map(tuple, df.collect()),
                      key=lambda r: (r[0], r[1] is None, r[1]))
        assert got == want and len(got) == nrows, (verb, sql, got)
    with pytest.raises(DialectError):
        to_sql(spark.sql("SELECT stack(2, 1, 2, 3, 4) AS (a, b)"),
               DUCKDB, validate=False)


def test_subquery_repair_scoping_duckdb(spark):
    """r11 ADVICE #1 (high): repair candidates are per-_expr_sql-call
    scoped, and subquery SPINE nodes carry their own dialect checks.
    (a) frac→int CAST over a scalar subquery TRUNCATES in the DuckDB
    text (the old spine render silently rounded); (b) a repairable cast
    NEXT TO a subquery still translates (the old leftover-candidate
    re-application spuriously refused); (c) unix_timestamp over a
    subquery refuses loudly instead of recording a droppable repair."""
    import duckdb

    # (a) avg = 1.8333…: Spark CAST truncates to 1, raw DuckDB rounds
    # to 2 — the emitted text must carry trunc() inside the CAST.
    df = spark.sql("SELECT CAST((SELECT avg(x) FROM VALUES (1.0), (2.0),"
                   " (2.5) AS s(x)) AS INT) AS c")
    sql = to_sql(df, DUCKDB, validate=False)
    assert "trunc(" in sql, sql
    assert duckdb.sql(sql).fetchall() == [(1,)] == \
        [tuple(r) for r in df.collect()]

    # (b) the -2.7 cast must translate (trunc → -2, not round → -3)
    # both in the projection and in the WHERE conjunct beside the IN
    # subquery; the combined expression previously refused spuriously.
    df2 = spark.sql(
        "SELECT k, CAST(d AS INT) AS c FROM VALUES"
        " (1, CAST(2.7 AS DOUBLE)), (2, CAST(0.3 AS DOUBLE)),"
        " (3, CAST(-2.7 AS DOUBLE)) AS t(k, d)"
        " WHERE k IN (SELECT 1 UNION ALL SELECT 3)"
        " AND CAST(d AS INT) >= -2")
    sql2 = to_sql(df2, DUCKDB, validate=False)
    got = sorted(map(tuple, duckdb.sql(sql2).fetchall()))
    want = sorted(map(tuple, df2.collect()))
    assert got == want == [(1, 2), (3, -2)], (sql2, got)

    # (c) the timestamp-operand unix_timestamp repair cannot anchor
    # over a subquery render — must refuse, never silently drop.
    with pytest.raises(DialectError):
        to_sql(spark.sql("SELECT unix_timestamp((SELECT TIMESTAMP"
                         " '2024-01-01 00:00:00'), 'yyyy-MM-dd') AS u"),
               DUCKDB, validate=False)


def test_regex_dollar_and_zero_width_refusals(spark):
    """r11 ADVICE #2/#3: Java '$' matches before a trailing newline
    where RE2 matches only end-of-text — unescaped '$' (and \\Z) refuse
    through the safe-regex gate; an ESCAPED \\$ stays translatable.
    Zero-width-capable split patterns refuse (Java skips zero-width
    matches adjacent to a real match, DuckDB emits empty fields)."""
    import duckdb

    with pytest.raises(DialectError, match="end-of-text"):
        to_sql(spark.sql("SELECT 'abc' RLIKE 'abc$' AS r"),
               DUCKDB, validate=False)
    with pytest.raises(DialectError, match=r"\\Z"):
        to_sql(spark.sql(r"SELECT 'abc' RLIKE 'abc\\Z' AS r"),
               DUCKDB, validate=False)
    with pytest.raises(DialectError, match="empty string"):
        to_sql(spark.sql("SELECT split('a1b', '1*') AS s"),
               DUCKDB, validate=False)
    # escaped $ is a literal character in BOTH engines — translate + run
    df = spark.sql(r"SELECT 'xa$by' RLIKE 'a\\$b' AS r")
    sql = to_sql(df, DUCKDB, validate=False)
    assert duckdb.sql(sql).fetchall() == [(True,)] == \
        [tuple(r) for r in df.collect()]


def test_duckdb_multicolumn_generators(spark):
    """r12: the multi-column generators translate to DuckDB (each probed
    and value-compared): posexplode(+outer) via a LATERAL zip of two
    parallel unnests (generate_series 0-based pos CAST to INT — DuckDB
    1.0 lacks WITH ORDINALITY), map explode(+outer) via
    unnest(map_entries) + key/value field projection, inline(+outer)
    via a fresh struct column + explicit field-access projections
    (DuckDB's AS t(a, b) multi-name form silently binds only the first
    name to the whole struct, so unpacking must be explicit).  Inner
    variants drop NULL/empty inputs, outer variants null-emit — exactly
    Spark's semantics.  stack() keeps refusing."""
    import duckdb

    base = ("VALUES (1, array(10, 20)), (2, array()), "
            "(3, CAST(NULL AS ARRAY<INT>)) AS t(k, xs)")
    mbase = ("VALUES (1, map('a', 1, 'b', 2)), "
             "(2, CAST(NULL AS MAP<STRING,INT>)) AS t(k, m)")
    sbase = ("VALUES (1, array(named_struct('a', 1, 'b', 'x'), "
             "named_struct('a', 2, 'b', 'y'))), "
             "(2, CAST(NULL AS ARRAY<STRUCT<a:INT, b:STRING>>)) AS t(k, xs)")
    cases = [
        (f"SELECT k, posexplode(xs) FROM {base}", 2),
        (f"SELECT k, posexplode_outer(xs) FROM {base}", 4),
        (f"SELECT k, explode(m) FROM {mbase}", 2),
        (f"SELECT k, explode_outer(m) FROM {mbase}", 3),
        (f"SELECT k, inline(xs) FROM {sbase}", 2),
        (f"SELECT k, inline_outer(xs) FROM {sbase}", 3),
        ("SELECT posexplode(array(5, 6)) AS (p, c)", 2),
        (f"SELECT k, pos + 1 AS p1, col FROM "
         f"(SELECT k, posexplode(xs) FROM {base})", 2),
    ]
    norm = lambda rows: sorted(
        tuple("NULL" if x is None else x for x in r) for r in rows)
    for q, nrows in cases:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        got = norm(duckdb.sql(sql).fetchall())
        want = norm(map(tuple, df.collect()))
        assert got == want and len(got) == nrows, (q, sql, got, want)
    with pytest.raises(DialectError):
        to_sql(spark.sql("SELECT stack(2, 1, 2, 3, 4) AS (a, b)"),
               DUCKDB, validate=False)


def test_duckdb_translation_batch_r12(spark):
    """r12 DuckDB translation batch, each executed and value-compared:
    date_format E-family tokens (E/EE/EEE → %a short day name, EEEE →
    %A full name — unlocked the tpcds d_day_name derivation, the
    largest exec-refusal class at 102 entries), sequence() without a
    step over computed bounds (CASE on direction — Spark auto-descends
    where DuckDB generate_series silently empties), and complex-type
    CAST targets re-spelled in DuckDB syntax (T[] / MAP (K,V) /
    STRUCT (f T), spaced so the type text stays out of the map()/
    struct() value-expression rewrite rules; elementwise + NULL-
    preserving semantics probed identical).  Divergent nested element
    casts keep refusing (frac→int truncation class)."""
    import duckdb

    cases = [
        "SELECT date_format(DATE '2024-03-05', 'EEEE') AS dn,"
        " date_format(DATE '2024-03-05', 'E') AS sn,"
        " date_format(TIMESTAMP '2024-03-09 13:05:00', 'yyyy-MM-dd EEE')"
        " AS mix",
        "SELECT sequence(5, 2) AS d, sequence(1, 3) AS a",
        "SELECT k, sequence(k, 2) AS s FROM VALUES (5), (1) AS t(k)",
        "SELECT CAST(array(1, 2, NULL) AS ARRAY<DOUBLE>) AS a",
        "SELECT CAST(array(array('1'), array('2', '3'))"
        " AS ARRAY<ARRAY<INT>>) AS aa",
        "SELECT CAST(named_struct('x', 1, 'y', '2')"
        " AS STRUCT<x: BIGINT, y: STRING>).x AS sx",
    ]
    norm = lambda rows: sorted(
        repr(tuple(list(x) if isinstance(x, list) else x for x in r))
        for r in rows)
    for q in cases:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        assert norm(duckdb.sql(sql).fetchall()) == norm(
            map(tuple, df.collect())), (q, sql)
    with pytest.raises(DialectError, match="not repairable|truncates"):
        to_sql(spark.sql("SELECT CAST(array(1.5) AS ARRAY<INT>) AS a"),
               DUCKDB, validate=False)
    with pytest.raises(DialectError, match="strftime"):
        to_sql(spark.sql("SELECT date_format(DATE '2024-03-05', 'EEEEE')"
                         " AS narrow"), DUCKDB, validate=False)


def test_duckdb_exec_divergence_fixes_r12(spark):
    """r12 sweep-found divergence/execerr classes, each executed in
    DuckDB and value-compared: collect_list/collect_set keep NULL
    elements in DuckDB's list() where Spark skips them (FILTER clause
    reproduces the skip, in aggregate AND window position);
    grouping-sets containing the empty set emit DuckDB's standard
    1-row grand total over EMPTY input where Spark's Expand lowering
    emits 0 rows (HAVING count(*) > 0 guard, non-empty input
    untouched); sequence() bounds fed by sum() bind as HUGEINT with no
    generate_series overload (CAST AS BIGINT); window-position
    collect_list/set absorb their OVER clause into a count-emptiness
    guard; and the four DuckDB-absent datetime functions expand
    faithfully
    (months_between incl. month-end/fractional/roundOff=false cases,
    next_day strictly-later semantics, unix_date,
    date_from_unix_date)."""
    import duckdb

    cases = [
        # collect_list/set NULL skip (agg + window position)
        "SELECT k, sort_array(collect_list(v)) AS l,"
        " sort_array(collect_set(v)) AS s FROM VALUES (1, 1), (1, NULL),"
        " (1, 1), (2, CAST(NULL AS INT)) AS t(k, v) GROUP BY k",
        # grouping sets over empty and non-empty input
        "SELECT k, count(*) AS c FROM VALUES (1), (2) AS t(k)"
        " WHERE k > 99 GROUP BY ROLLUP(k)",
        "SELECT k, count(*) AS c FROM VALUES (1), (2) AS t(k)"
        " GROUP BY ROLLUP(k)",
        # sequence over HUGEINT-widened aggregate bounds
        "SELECT sequence(a, b) AS s FROM (SELECT sum(k) AS a,"
        " sum(k) + 2 AS b FROM VALUES (1), (2) AS t(k))",
        # DuckDB-absent datetime functions
        "SELECT months_between(TIMESTAMP '2024-03-17 12:00:00',"
        " TIMESTAMP '2024-01-15 00:00:00') AS frac,"
        " months_between(DATE '2024-03-31', DATE '2024-02-29') AS ends,"
        " months_between(DATE '2024-01-15', DATE '2024-03-15') AS neg,"
        " months_between(TIMESTAMP '2024-03-17 12:00:00',"
        " TIMESTAMP '2024-01-15 00:00:00', false) AS unrounded,"
        " months_between(CAST(NULL AS DATE), DATE '2024-01-01') AS n",
        "SELECT next_day(DATE '2024-01-14', 'Mon') AS from_sun,"
        " next_day(DATE '2024-01-15', 'Mon') AS strictly_later,"
        " next_day(DATE '2024-01-15', 'saturday') AS full_name,"
        " unix_date(DATE '2024-01-15') AS ud,"
        " date_from_unix_date(19737) AS dfu",
    ]
    norm = lambda rows: sorted(
        repr(tuple(list(x) if isinstance(x, list) else x for x in r))
        for r in rows)
    for q in cases:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        assert norm(duckdb.sql(sql).fetchall()) == norm(
            map(tuple, df.collect())), (q, sql)
    # Spark dialect text stays guard-free and native-semantics
    sql = to_sql(spark.sql(cases[2]), SPARK)
    assert "HAVING" not in sql
    with pytest.raises(DialectError, match="day name"):
        to_sql(spark.sql("SELECT next_day(DATE '2024-01-14', 'Xy') AS d"),
               DUCKDB, validate=False)
    # window-position collect_list/set ABSORB the OVER clause into a
    # count-emptiness guard (DuckDB list() FILTER OVER is NULL for an
    # all-NULL or empty frame where Spark emits []) — value-compared
    # across all-NULL, mixed and FOLLOWING-only-frame rows
    for q in [
        "SELECT k, collect_list(v) OVER (ORDER BY k) AS l FROM VALUES"
        " (1, CAST(NULL AS INT)), (2, 2), (3, NULL) AS t(k, v)",
        "SELECT k, collect_set(v) OVER (ORDER BY k ROWS BETWEEN 1"
        " FOLLOWING AND 2 FOLLOWING) AS s FROM VALUES (1, 1), (2, 1)"
        " AS t(k, v)",
    ]:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        assert norm(duckdb.sql(sql).fetchall()) == norm(
            map(tuple, df.collect())), (q, sql)


def test_duckdb_translation_batch_r12b(spark):
    """Second r12 DuckDB translation batch, executed and value-compared:
    min_by/max_by over STRUCT rankings via first(x ORDER BY fields)
    (DuckDB's arg_min/arg_max have no struct overload; field-wise
    NULL-smallest ordering matches Spark's struct comparator — probed
    on NULL-field, NULL-value and multi-key cases), substring_index
    with a literal delimiter via string_split + list_slice (NULL count
    guarded explicitly: DuckDB greatest() ignores NULL operands), and
    regexp_count via len(regexp_extract_all) behind the safe-regex
    gate.  Window-position struct rankings refuse (DuckDB parser has
    no ORDER BY in window aggregates); non-literal delimiters refuse
    (array_to_string takes constant separators only)."""
    import duckdb

    cases = [
        "SELECT k, max_by(x, struct(a, b)) AS mx,"
        " min_by(x, struct(a, b)) AS mn FROM VALUES"
        " (1, 'p', 1, 2), (1, 'q', 1, 3), (1, 'r', 0, 9),"
        " (2, 'u', CAST(NULL AS INT), 0), (2, 'v', 7, 7)"
        " AS t(k, x, a, b) GROUP BY k",
        "SELECT min_by(x, a) AS scalar_form FROM"
        " VALUES ('p', 3), ('q', 1) AS t(x, a)",
        "SELECT substring_index('a.b.c.d', '.', 2) AS p,"
        " substring_index('a.b.c.d', '.', -2) AS m,"
        " substring_index('a::b::c', '::', -1) AS mc,"
        " substring_index('abc', '.', 5) AS whole",
        "SELECT k, substring_index(s, '.', n) AS r FROM VALUES"
        " (1, 'x.y.z', 1), (2, 'x.y.z', -9), (3, 'x.y.z',"
        " CAST(NULL AS INT)), (4, CAST(NULL AS STRING), 0) AS t(k, s, n)",
        "SELECT regexp_count('ababab', 'ab') AS c1,"
        " regexp_count('aaa', 'a+') AS c2, regexp_count('xyz', 'q') AS c0",
        # regexp_substr: Spark NULL on no-match vs DuckDB '' — guarded
        "SELECT regexp_substr('foo12bar', '[0-9]+') AS hit,"
        " regexp_substr('xyz', '[0-9]+') AS miss,"
        " regexp_substr(CAST(NULL AS STRING), 'a') AS ns",
    ]
    norm = lambda rows: sorted(
        repr(tuple(list(x) if isinstance(x, list) else x for x in r))
        for r in rows)
    for q in cases:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        assert norm(duckdb.sql(sql).fetchall()) == norm(
            map(tuple, df.collect())), (q, sql)
    # WINDOW-position struct ranking: Catalyst pre-projects the struct
    # into a _wN column, so the handler sees a bare attribute (the
    # struct_pack branch and its refusal guard the aggregate path);
    # DuckDB's binder then rejects max_by over a struct column LOUDLY —
    # never a silent divergence.  Pin the loud-failure posture.
    wsql = to_sql(spark.sql(
        "SELECT max_by(x, struct(a)) OVER (PARTITION BY k) AS r"
        " FROM VALUES (1, 'p', 1) AS t(k, x, a)"),
        DUCKDB, validate=False)
    with pytest.raises(Exception, match="[Bb]inder|No function"):
        duckdb.sql(wsql).fetchall()
    with pytest.raises(DialectError, match="literal"):
        to_sql(spark.sql(
            "SELECT substring_index(s, s, 1) AS r FROM"
            " VALUES ('a.b') AS t(s)"), DUCKDB, validate=False)


def test_duckdb_get_json_object_guards(spark):
    """r12 probe finds on the bare json_extract_string rename:
    (1) malformed JSON — Spark returns NULL, DuckDB raises; the
    json_valid() CASE restores the NULL (value-compared over valid,
    malformed and NULL docs).  (2) wildcard/recursive paths — Spark
    returns the matched JSON TEXT ('[1,2]'), DuckDB a LIST
    (['1','2']): silent type+value divergence, refused.  Non-literal
    paths refuse (Spark maps invalid paths to NULL where DuckDB
    raises)."""
    import duckdb

    q = ("SELECT get_json_object(j, '$.a') AS a,"
         " get_json_object(j, '$.b.c') AS bc FROM VALUES"
         " ('{\"a\": 1, \"b\": {\"c\": \"x\"}}'), ('not json'),"
         " (CAST(NULL AS STRING)) AS t(j)")
    df = spark.sql(q)
    sql = to_sql(df, DUCKDB, validate=False)
    norm = lambda rows: sorted(map(repr, map(tuple, rows)))
    assert norm(duckdb.sql(sql).fetchall()) == norm(
        map(tuple, df.collect())), sql
    with pytest.raises(DialectError, match="wildcard"):
        to_sql(spark.sql(
            "SELECT get_json_object('{\"a\":[1,2]}', '$.a[*]') AS r"),
            DUCKDB, validate=False)
    with pytest.raises(DialectError, match="string literal"):
        to_sql(spark.sql(
            "SELECT get_json_object(j, j) AS r FROM VALUES ('{}')"
            " AS t(j)"), DUCKDB, validate=False)


def test_duckdb_signum_nan_guard(spark):
    """r12 probe find: Spark signum()/sign() always returns DOUBLE and
    propagates NaN; DuckDB sign() returns an integer class and maps
    NaN to 0 — a silent value divergence.  The emitted isnan CASE +
    DOUBLE cast reproduce Spark exactly (value-compared over negative,
    zero, NaN, positive and NULL inputs)."""
    import duckdb

    q = ("SELECT signum(x) AS s, sign(x) AS s2 FROM VALUES (-2.5),"
         " (0.0), (CAST('NaN' AS DOUBLE)), (3.0),"
         " (CAST(NULL AS DOUBLE)) AS t(x)")
    df = spark.sql(q)
    sql = to_sql(df, DUCKDB, validate=False)
    norm = lambda rows: sorted(map(repr, map(tuple, rows)))
    assert norm(duckdb.sql(sql).fetchall()) == norm(
        map(tuple, df.collect())), sql


def test_duckdb_positional_string_guards(spark):
    """r12 probe finds on pass-through positional string functions,
    each value-compared after the guard: left()/right() return '' for
    n <= 0 in Spark where DuckDB reads negative n as all-but-n-from-
    the-other-end (left('abcde', -1) = 'abcd'); Spark treats substring
    position 0 as position 1 ('ab' vs DuckDB's 'a') and returns ''
    for a negative LENGTH where DuckDB reads it end-relative
    (substr('abcde', 2, -1) = 'a'); lpad/rpad with an EMPTY pad
    return the clamped input in Spark where DuckDB raises
    Insufficient-padding (non-empty literal pads skip the guard;
    negative positions, zero lengths and truncation agree exactly)."""
    import duckdb

    cases = [
        "SELECT left(s, n) AS l, right(s, n) AS r FROM VALUES"
        " ('abcde', -1), ('abcde', 0), ('abcde', 3), ('abcde', 99),"
        " (CAST(NULL AS STRING), 1), ('abc', CAST(NULL AS INT))"
        " AS t(s, n)",
        "SELECT substring(s, p, n) AS x FROM VALUES ('abcde', 0, 2),"
        " ('abcde', 2, -1), ('abcde', -2, 2), ('abcde', -2, 4),"
        " ('abcde', 1, 0), ('abcde', 3, 99), ('abcde', -9, 3)"
        " AS t(s, p, n)",
        "SELECT lpad(s, n, p) AS lp, rpad(s, n, p) AS rp FROM VALUES"
        " ('abc', 6, ''), ('abc', 2, ''), ('abc', -1, 'x'),"
        " ('abc', 6, 'xy'), ('abc', 2, 'x') AS t(s, n, p)",
    ]
    norm = lambda rows: sorted(map(repr, map(tuple, rows)))
    for q in cases:
        df = spark.sql(q)
        sql = to_sql(df, DUCKDB, validate=False)
        assert norm(duckdb.sql(sql).fetchall()) == norm(
            map(tuple, df.collect())), (q, sql)
    # a provably non-empty literal pad stays a bare lpad (no CASE arm)
    sql = to_sql(spark.sql("SELECT lpad('a', 5, 'x') AS p"), DUCKDB,
                 validate=False)
    assert "CASE" not in sql

"""Unit tests for the DataFusion dialect translator + SessionContext.

Translation tests are pure string-level (no Spark session); execution
tests run translated SQL end-to-end on the shared session.
"""

from __future__ import annotations

import pytest

from datafusion_spark.compat import SessionContext, translate_sql
from datafusion_spark.compat.dialect import DialectError

from conftest import SF_SMALL


# ---------------------------------------------------------------------------
# pure translation
# ---------------------------------------------------------------------------

def test_renames_and_nesting():
    out = translate_sql("SELECT strpos(upper(name), 'X'), to_hex(k) FROM t")
    assert "instr(upper(name), 'X')" in out
    assert "hex(k)" in out


def test_unary_log_is_base10():
    assert "log10(x)" in translate_sql("SELECT log(x) FROM t")
    assert "log(2, x)" in translate_sql("SELECT log(2, x) FROM t")


def test_string_literals_untouched():
    sql = "SELECT 'strpos(a, b)' AS lit, strpos(a, 'b') FROM t"
    out = translate_sql(sql)
    assert "'strpos(a, b)'" in out          # literal body preserved
    assert "instr(a, 'b')" in out


def test_comments_and_quoted_idents_untouched():
    sql = 'SELECT "strpos" FROM t -- strpos(a, b)\n'
    assert translate_sql(sql) == sql


def test_array_slice_is_end_inclusive():
    out = translate_sql("SELECT array_slice(a, 2, 4) FROM t")
    assert "slice(a, 2, (4) - (2) + 1)" in out


def test_range_is_end_exclusive():
    assert "sequence(2, (6) - 1)" in translate_sql("SELECT range(2, 6)")


def test_date_bin_interval_literal():
    out = translate_sql(
        "SELECT date_bin(INTERVAL '15 minutes', ts) FROM t")
    assert "pmod(unix_micros(ts) - 0, 900000000)" in out
    out2 = translate_sql(
        "SELECT date_bin(INTERVAL '2' HOUR, ts, TIMESTAMP '2001-01-01') FROM t")
    assert "7200000000" in out2 and "unix_micros(TIMESTAMP '2001-01-01')" in out2


def test_chrono_format_translation():
    out = translate_sql("SELECT to_char(ts, '%Y-%m-%d %H:%M:%S') FROM t")
    assert "date_format(ts, 'yyyy-MM-dd HH:mm:ss')" in out
    with pytest.raises(DialectError):
        translate_sql("SELECT to_char(ts, '%Q') FROM t")


def test_encode_decode_dispatch():
    out = translate_sql("SELECT encode(x, 'base64'), decode(y, 'hex') FROM t")
    assert "base64(x)" in out and "unhex(y)" in out
    with pytest.raises(DialectError):
        translate_sql("SELECT encode(x, fmt) FROM t")   # non-literal encoding


def test_string_agg_order_by_becomes_listagg():
    out = translate_sql("SELECT string_agg(n, ',' ORDER BY n DESC) FROM t")
    assert "listagg(n, ',') WITHIN GROUP (ORDER BY n DESC)" in out


def test_unsupported_raises_with_reason():
    with pytest.raises(DialectError, match="TIME type"):
        translate_sql("SELECT make_time(1, 2, 3)")
    with pytest.raises(DialectError, match="regexp_extract_all"):
        translate_sql("SELECT regexp_match(s, 'x') FROM t")


def test_non_function_identifiers_pass_through():
    # a column merely NAMED like a mapped function is not a call
    sql = "SELECT log, strpos FROM metrics WHERE range > 2"
    assert translate_sql(sql) == sql


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

def test_session_context_end_to_end(spark):
    ctx = SessionContext(spark)
    ctx.register_parquet("nation_c", f"{SF_SMALL}/nation.parquet")
    assert ctx.table_exist("nation_c")
    rows = ctx.sql("""
        SELECT n_regionkey,
               array_to_string(array_sort(array_agg(n_name)), ',') AS names,
               gcd(CAST(min(n_nationkey) + 6 AS BIGINT), 9)        AS g
        FROM nation_c GROUP BY n_regionkey ORDER BY n_regionkey
    """).collect()
    assert len(rows) == 5
    assert all(r.g == 3 or 9 % r.g == 0 for r in rows)
    ctx.deregister_table("nation_c")
    assert "nation_c" not in ctx.tables()


def test_translated_filters_still_push_down(spark):
    # the translated query must keep parquet predicate pushdown intact
    ctx = SessionContext(spark)
    ctx.register_parquet("orders_c", f"{SF_SMALL}/orders.parquet")
    df = ctx.sql(
        "SELECT o_orderkey FROM orders_c WHERE starts_with(o_orderstatus, 'F')"
        " AND o_orderkey < 100")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan


def test_gcd_lcm_values(spark):
    row = spark.sql(translate_sql(
        "SELECT gcd(12, 18) AS g, lcm(4, 6) AS l, gcd(0, 5) AS gz,"
        " lcm(0, 5) AS lz")).collect()[0]
    assert (row.g, row.l, row.gz, row.lz) == (6, 12, 5, 0)


def test_create_external_table_rewrite():
    out = translate_sql(
        "CREATE EXTERNAL TABLE t STORED AS PARQUET LOCATION '/tmp/x.parquet'")
    assert out == "CREATE TABLE t USING parquet LOCATION '/tmp/x.parquet'"
    out2 = translate_sql(
        "CREATE EXTERNAL TABLE IF NOT EXISTS c (a INT, b STRING) STORED AS CSV"
        " WITH HEADER ROW LOCATION '/tmp/c.csv'")
    assert "USING csv" in out2 and "OPTIONS (header 'true')" in out2
    assert "IF NOT EXISTS" in out2 and "(a INT, b STRING)" in out2
    with pytest.raises(DialectError, match="unsupported format"):
        translate_sql("CREATE EXTERNAL TABLE t STORED AS DELTA LOCATION '/x'")


def test_exclude_rewrite():
    assert translate_sql("SELECT * EXCLUDE (a, b) FROM t") == \
        "SELECT * EXCEPT (a, b) FROM t"
    assert translate_sql("SELECT * EXCLUDE a FROM t") == \
        "SELECT * EXCEPT (a) FROM t"


def test_qualify_translated_not_refused():
    out = translate_sql(
        "SELECT x FROM t QUALIFY row_number() OVER (ORDER BY x) = 1")
    assert "WHERE __qualify__" in out
    # the word inside a string literal is not a clause
    assert "qualify" in translate_sql("SELECT 'we qualify leads' FROM t")


def test_external_table_executes(spark, tmp_path):
    ctx = SessionContext(spark)
    src = spark.range(5).toDF("k")
    src.write.mode("overwrite").parquet(str(tmp_path / "p.parquet"))
    ctx.sql(f"CREATE EXTERNAL TABLE ext_compat_t STORED AS PARQUET"
            f" LOCATION '{tmp_path}/p.parquet'")
    assert ctx.sql("SELECT count(*) AS n FROM ext_compat_t").collect()[0].n == 5
    spark.sql("DROP TABLE ext_compat_t")


def test_copy_statement(spark, tmp_path):
    ctx = SessionContext(spark)
    ctx.register_parquet("part_cp", f"{SF_SMALL}/part.parquet")
    expected = spark.table("part_cp").filter("p_partkey < 50").count()
    out = ctx.sql(f"COPY (SELECT p_partkey, p_brand FROM part_cp WHERE p_partkey < 50)"
                  f" TO '{tmp_path}/out_parq' STORED AS parquet"
                  f" OPTIONS ('format.compression' 'zstd(10)')")
    assert out.collect()[0][0] == expected
    back = spark.read.parquet(f"{tmp_path}/out_parq")
    assert back.columns == ["p_partkey", "p_brand"] and back.count() == expected
    # partitioned copy of a registered table
    out2 = ctx.sql(f"COPY part_cp TO '{tmp_path}/out_part' STORED AS parquet"
                   f" PARTITIONED BY (p_brand)")
    assert out2.collect()[0][0] == spark.table("part_cp").count()
    import os
    assert any(d.startswith("p_brand=") for d in os.listdir(f"{tmp_path}/out_part"))
    with pytest.raises(DialectError, match="unsupported option"):
        ctx.sql(f"COPY part_cp TO '{tmp_path}/x' STORED AS parquet"
                f" OPTIONS ('format.mystery' '1')")


def test_prepare_execute(spark):
    ctx = SessionContext(spark)
    ctx.register_parquet("nation_pe", f"{SF_SMALL}/nation.parquet")
    ctx.sql("PREPARE reg_n(INT) AS SELECT count(*) AS n FROM nation_pe"
            " WHERE n_regionkey = $1")
    assert ctx.sql("EXECUTE reg_n(2)").collect()[0].n == 5
    assert ctx.sql("EXECUTE reg_n(99)").collect()[0].n == 0
    with pytest.raises(DialectError, match="expected 1 arguments"):
        ctx.sql("EXECUTE reg_n(1, 2)")
    with pytest.raises(DialectError, match="data types"):
        ctx.sql("PREPARE bad(INT) AS SELECT $1 + $2")


def test_set_statement_mapping(spark):
    ctx = SessionContext(spark)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        ctx.sql("SET datafusion.execution.target_partitions = 7")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        ctx.sql("SET datafusion.execution.batch_size = 8192")   # mapped no-op
        with pytest.raises(DialectError, match="no Spark mapping"):
            ctx.sql("SET datafusion.optimizer.unknown_knob = 1")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_information_schema_views(spark):
    ctx = SessionContext(spark)
    ctx.register_parquet("region_is", f"{SF_SMALL}/region.parquet")
    tabs = {r.table_name for r in
            ctx.sql("SELECT table_name FROM information_schema.tables").collect()}
    assert "region_is" in tabs
    cols = ctx.sql(
        "SELECT column_name, data_type, is_nullable FROM information_schema.columns"
        " WHERE table_name = 'region_is' ORDER BY column_name").collect()
    assert [c.column_name for c in cols] == ["r_name", "r_regionkey"]
    settings = ctx.sql("SELECT * FROM information_schema.df_settings").collect()
    assert any(s.name == "spark.sql.shuffle.partitions" for s in settings)


def test_dataframe_compat_verbs(spark):
    from pyspark.sql import functions as F

    df = spark.range(6).with_column("g", (F.col("id") % 2).cast("int"))
    agg = df.aggregate([F.col("g")], [F.sum("id").alias("s")]).orderBy("g").collect()
    assert [(r.g, r.s) for r in agg] == [(0, 6), (1, 9)]
    assert df.select_columns("id").columns == ["id"]
    assert df.with_column_renamed("g", "grp").columns == ["id", "grp"]
    u = spark.range(3).union_distinct(spark.range(3))
    assert u.count() == 3
    pdf = df.to_pandas()
    assert len(pdf) == 6


def test_unnest_columns_positional(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [10, 20, 30], ["a", "b"])], "k int, xs array<int>, ys array<string>")
    out = df.unnest_columns("xs", "ys").orderBy("xs").collect()
    # positional zip: shorter list pads with NULL
    assert [(r.xs, r.ys) for r in out] == [(10, "a"), (20, "b"), (30, None)]
    single = df.unnest_columns("xs")
    assert single.count() == 3


def test_regexp_like_flags(spark):
    out = translate_sql("SELECT regexp_like('AbC', 'abc', 'i') AS x")
    assert "(?i)" in out
    assert spark.sql(out).collect()[0].x is True
    with pytest.raises(DialectError, match="'i' flag"):
        translate_sql("SELECT regexp_like(s, p, 'x') FROM t")


# ---------------------------------------------------------------------------
# QUALIFY rewrite (reference sqllogictest qualify.slt)
# ---------------------------------------------------------------------------

def test_qualify_alias_predicate_rewrite():
    out = translate_sql(
        "SELECT id, ROW_NUMBER() OVER (PARTITION BY d ORDER BY s DESC) AS rn"
        " FROM t QUALIFY rn = 1")
    # alias substituted into the inner boolean column, outer filter added
    assert "AS __qualify__" in out and out.startswith("SELECT * EXCEPT")
    assert "WHERE __qualify__" in out
    assert "((ROW_NUMBER() OVER (PARTITION BY d ORDER BY s DESC)) = 1)" in out


def test_qualify_orderby_on_nonprojected_column():
    out = translate_sql(
        "SELECT id, RANK() OVER (ORDER BY s) AS r FROM t"
        " QUALIFY r <= 2 ORDER BY d, id")
    # d is not in the select list: must be carried through and EXCEPTed out
    assert ", d," in out.replace(", d ,", ", d,") or ", d," in out
    assert "EXCEPT (__qualify__, d)" in out


def test_qualify_orderby_expression_over_nonprojected_column():
    """ORDER BY upper(nm) post-QUALIFY: nm sits inside parens (depth 1) and
    must still be carried through the rewrite subquery; a CAST's type name
    must NOT be read as a column."""
    out = translate_sql(
        "SELECT id, RANK() OVER (ORDER BY s) AS r FROM t"
        " QUALIFY r <= 2 ORDER BY upper(nm), cast(d AS INT), id")
    assert "EXCEPT (__qualify__, nm, d)" in out


def test_qualify_execution_matches_handwritten(spark):
    from conftest import SF_SMALL
    ctx = SessionContext(spark)
    ctx.register_parquet("orders_q", f"{SF_SMALL}/orders.parquet")
    got = ctx.sql("""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders_q QUALIFY rn = 1 ORDER BY o_custkey LIMIT 20
    """).collect()
    exp = spark.sql(f"""
        SELECT o_custkey, o_orderkey, rn FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM parquet.`{SF_SMALL}/orders.parquet`) WHERE rn = 1
        ORDER BY o_custkey LIMIT 20
    """).collect()
    assert got == exp


def test_qualify_grouped_window_over_aggregate(spark):
    from conftest import SF_SMALL
    ctx = SessionContext(spark)
    ctx.register_parquet("orders_q2", f"{SF_SMALL}/orders.parquet")
    rows = ctx.sql("""
        SELECT o_orderpriority, SUM(o_totalprice) AS s
        FROM orders_q2 GROUP BY o_orderpriority
        QUALIFY RANK() OVER (ORDER BY SUM(o_totalprice) DESC) = 1
    """).collect()
    assert len(rows) == 1


def test_qualify_error_parity():
    # DataFusion rejects QUALIFY with no window function anywhere
    with pytest.raises(DialectError, match="window function"):
        translate_sql("SELECT id, name FROM users QUALIFY id > 1")
    with pytest.raises(DialectError, match="set operation"):
        translate_sql("SELECT 1 AS x UNION ALL SELECT 2 AS x QUALIFY x > 1")

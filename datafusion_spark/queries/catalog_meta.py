"""information_schema / catalog surface (reference: datafusion/catalog/src/
information_schema.rs — tables, columns, df_settings virtual tables).

Spark equivalent: the catalog API + DataFrame schemas.  The column listing
is driver-side metadata (parquet footers), same as DataFusion's catalog
provider — there is no data-path work here, so building the tiny result
with ``createDataFrame`` is the right call at any scale.  The row-count
entry, by contrast, is a real distributed query: a UNION ALL of per-table
``COUNT(*)`` jobs, each served from parquet row-group statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import TABLES, load_table
from datafusion_spark.queries.registry import query
from datafusion_spark.queries.helpers import values_df


def information_schema_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, column_name, ordinal_position) for every registered table."""
    rows = []
    for t in TABLES:
        for i, f_ in enumerate(load_table(spark, sf_dir, t).schema.fields):
            rows.append((t, f_.name, i + 1))
    return values_df(
        spark, rows,
        "table_name string, column_name string, ordinal_position long"
    )


@query(
    "catalog_columns",
    oracle="""
    SELECT table_name, column_name, CAST(ordinal_position AS BIGINT) AS ordinal_position
    FROM information_schema.columns
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents','embeddings')
    """,
    tags=("catalog",),
)
def catalog_columns(spark, sf_dir):
    return information_schema_columns(spark, sf_dir)


@query(
    "catalog_table_stats",
    oracle="""
    SELECT 'region' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM region
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'events', COUNT(*) FROM events
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    """,
    tags=("catalog",),
)
def catalog_table_stats(spark, sf_dir):
    """Row count per table — Spark serves COUNT(*) from parquet footer
    statistics (no full scan; see InMemoryFileIndex + row-group counts)."""
    counts = None
    for t in TABLES:
        c = load_table(spark, sf_dir, t).agg(
            F.count(F.lit(1)).alias("n_rows")
        ).select(F.lit(t).alias("table_name"), "n_rows")
        counts = c if counts is None else counts.unionAll(c)
    return counts


@query(
    "catalog_column_stats",
    oracle="""
    SELECT 'o_totalprice' AS column_name,
           COUNT(*) AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS ndv,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_v,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    """,
    tags=("catalog", "statistics"),
)
def catalog_column_stats(spark, sf_dir):
    """ANALYZE-style column statistics (reference: datafusion/common/src/
    stats.rs + ANALYZE TABLE): count / non-null / NDV / min / max per
    column — the inputs a cost-based optimizer needs.  One pass per column
    set; at scale NDV would switch to approx_count_distinct (HLL)."""
    o = load_table(spark, sf_dir, "orders")

    def stats(col):
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(col)).alias("n_nonnull"),
            F.count_distinct(F.col(col)).alias("ndv"),
            F.min(F.col(col)).cast("double").alias("min_v"),
            F.max(F.col(col)).cast("double").alias("max_v"),
        ).select("column_name", "n_rows", "n_nonnull", "ndv", "min_v", "max_v")

    return stats("o_totalprice").unionAll(stats("o_custkey"))


@query(
    "catalog_external_table",
    oracle="""
    SELECT n_name, r_name AS region_name, n_nationkey
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name <> 'EUROPE'
    """,
    tags=("catalog", "ddl", "external-table"),
)
def catalog_external_table(spark, sf_dir):
    """CREATE EXTERNAL TABLE + CREATE VIEW DDL surface (reference:
    datafusion/sql/src/statement.rs CreateExternalTable — the primary way
    DataFusion attaches parquet locations to names).  Spark: CREATE TABLE
    ... USING parquet LOCATION registers a metadata-only external table
    (no data copy, scans prune/pushdown like any parquet source); a view
    stacks on it.  Entry is idempotent (DROP IF EXISTS first) because the
    driver may re-run it in one session."""
    loc_n = f"{sf_dir}/nation.parquet"
    loc_r = f"{sf_dir}/region.parquet"
    spark.sql("DROP VIEW IF EXISTS ext_nation_named")
    spark.sql("DROP TABLE IF EXISTS ext_nation")
    spark.sql("DROP TABLE IF EXISTS ext_region")
    spark.sql(f"CREATE TABLE ext_nation USING parquet LOCATION '{loc_n}'")
    spark.sql(f"CREATE TABLE ext_region USING parquet LOCATION '{loc_r}'")
    spark.sql(
        """CREATE VIEW ext_nation_named AS
           SELECT n_name, r_name AS region_name, n_nationkey
           FROM ext_nation JOIN ext_region ON n_regionkey = r_regionkey"""
    )
    return spark.sql(
        "SELECT * FROM ext_nation_named WHERE region_name <> 'EUROPE'"
    )


@query(
    "catalog_create_function",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS disc_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(38,6))) AS DOUBLE) AS charged_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("catalog", "ddl", "sql-udf"),
)
def catalog_create_function(spark, sf_dir):
    """CREATE FUNCTION — SQL-defined scalar UDFs (reference: sqllogictest
    create_function.slt; DataFusion's CREATE FUNCTION extension point).
    Spark's SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN
    expr) are INLINED by Catalyst into the calling plan — whole-stage
    codegen, zero Python round-trip — so abstraction costs nothing; the
    oracle spells the expressions out flat."""
    from datafusion_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
           RETURNS DOUBLE RETURN p * (1 - d)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION charged(p DOUBLE, d DOUBLE, t DOUBLE)
           RETURNS DOUBLE RETURN disc_price(p, d) * (1 + t)"""
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                    AS DECIMAL(38,6))) AS DOUBLE) AS disc_revenue,
               CAST(SUM(CAST(charged(l_extendedprice, l_discount, l_tax)
                    AS DECIMAL(38,6))) AS DOUBLE) AS charged_revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "catalog_describe_table",
    oracle="""
    SELECT column_name AS col_name,
           CASE data_type WHEN 'VARCHAR' THEN 'string'
                          WHEN 'BIGINT' THEN 'bigint'
                          WHEN 'INTEGER' THEN 'int'
                          WHEN 'DOUBLE' THEN 'double'
                          ELSE lower(data_type) END AS data_type
    FROM information_schema.columns
    WHERE table_name = 'nation'
    """,
    tags=("catalog", "ddl"),
)
def catalog_describe_table(spark, sf_dir):
    """DESCRIBE TABLE (reference: sqllogictest describe.slt; DataFusion's
    DESCRIBE produces column/type rows).  Spark's DESCRIBE output is
    projected to (col_name, data_type) and the oracle derives the same
    rows from DuckDB's information_schema with a type-spelling map —
    metadata-only on both engines, no data scan."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_describe_v"
    )
    return spark.sql("DESCRIBE TABLE nation_describe_v").select(
        "col_name", "data_type"
    )


@query(
    "dml_truncate_table",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS n_after_truncate,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nation WHERE n_regionkey = 0)
             AS n_after_reload
    """,
    tags=("dml", "ddl", "truncate"),
)
def dml_truncate_table(spark, sf_dir):
    """TRUNCATE TABLE (reference: sqllogictest truncate.slt).  A managed
    copy of nation is truncated (metadata+file drop, no row-level
    delete), then selectively reloaded; the checked result is both
    counts.  Scale: truncate is O(files), the reload is a partition-
    pruned insert — the lakehouse reset-and-backfill pattern."""
    import shutil

    nation = load_table(spark, sf_dir, "nation")
    spark.sql("DROP TABLE IF EXISTS nation_trunc")
    # TRUNCATE only works on managed tables; clear any stale location left
    # by a previous session (DROP in a fresh catalog doesn't know about it)
    loc = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{loc.rstrip('/')}/nation_trunc", ignore_errors=True)
    nation.write.mode("overwrite").saveAsTable("nation_trunc")
    spark.sql("TRUNCATE TABLE nation_trunc")
    n_after_truncate = spark.table("nation_trunc").count()
    nation.filter(F.col("n_regionkey") == 0).write.insertInto("nation_trunc")
    n_after_reload = spark.table("nation_trunc").count()
    return spark.range(1).select(
        F.lit(n_after_truncate).cast("bigint").alias("n_after_truncate"),
        F.lit(n_after_reload).cast("bigint").alias("n_after_reload"),
    )


@query(
    "catalog_parquet_metadata",
    oracle="""
    SELECT row_group_id, row_group_num_rows AS num_rows,
           COUNT(*) AS n_cols
    FROM parquet_metadata('__SF__/lineitem.parquet')
    GROUP BY 1, 2 ORDER BY 1
    """.replace("__SF__", "/root/testdata/sf0.01"),
    # The oracle path is pinned to the driver's sf0.01 gate dir; the sweep
    # (tools/oracle_check.py) skips this entry at any other --sf.
    tags=("catalog", "metadata", "parquet", "sf-pinned:/root/testdata/sf0.01"),
)
def catalog_parquet_metadata(spark, sf_dir):
    """Parquet footer introspection (reference sqllogictest
    parquet_metadata_functions.slt / datasource-parquet metadata surface;
    DuckDB's parquet_metadata() is the oracle): per-row-group row counts
    and column counts straight from the footer — no data scan.  Footer
    reads are driver-side by design (the same listing-phase metadata pass
    every engine performs before planning); at 100 TB this would walk the
    file listing distributed via spark.read.format('binaryFile') over
    footers, but the per-file logic is identical.  Handles both layouts a
    table can have at scale: a single .parquet file (the testdata shape)
    or a DIRECTORY of part files (every real written table) — files are
    walked in sorted order so row_group_id stays deterministic."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    from datafusion_spark.catalog import table_path

    path = table_path(sf_dir, "lineitem")
    files = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    rows, gid = [], 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_row_groups):
            rows.append((gid, md.row_group(i).num_rows, md.row_group(i).num_columns))
            gid += 1
    return values_df(
        spark, rows, "row_group_id bigint, num_rows bigint, n_cols bigint"
    )


# --- statistics-driven planning: listing_table_statistics.slt /
# --- statistics_registry.slt mirror (r7) ------------------------------------


_CBO_JOIN_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue
    FROM cbo_lineitem JOIN cbo_orders ON l_orderkey = o_orderkey
    WHERE o_orderkey <= 150
    GROUP BY o_orderpriority
"""


def _cbo_tables(spark: SparkSession, sf_dir: str) -> None:
    """External tables + ANALYZE, idempotent.  ANALYZE is re-run on every
    call — it's a metadata-only footer/column scan on the dimension-scale
    inputs here, and re-running keeps the stats honest if sf_dir changes
    between calls in one session."""
    for name, table in (("cbo_orders", "orders"), ("cbo_lineitem", "lineitem")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} USING parquet "
            f"LOCATION '{sf_dir}/{table}.parquet'"
        )
    spark.sql(
        "ANALYZE TABLE cbo_orders COMPUTE STATISTICS "
        "FOR COLUMNS o_orderkey, o_orderpriority, o_totalprice"
    )
    spark.sql(
        "ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS "
        "FOR COLUMNS l_orderkey, l_extendedprice"
    )


@query(
    "catalog_analyze_cbo",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey <= 150
    GROUP BY o_orderpriority
    """,
    tags=("catalog", "statistics", "cbo", "slt"),
)
def catalog_analyze_cbo(spark, sf_dir):
    """Statistics-driven planning, mirroring the reference's
    listing_table_statistics.slt / statistics_registry.slt: the listing
    table exposes exact row-count/size/min/max statistics and the
    optimizer consumes them for estimation.  Spark's analogue is ANALYZE
    TABLE ... COMPUTE STATISTICS FOR COLUMNS + spark.sql.cbo.enabled:
    with column stats, FilterEstimation turns `o_orderkey <= 150` into a
    ~1% selectivity from the [min,max] range, the filtered side's
    estimated size drops below the broadcast threshold, and the join
    plans as BroadcastHashJoin — withOUT stats the size-only estimator
    keeps the full file size and the same query plans a shuffle join.
    That stats-flip is THE 100 TB lever (a mis-estimated build side at
    scale is an OOM or a needless TB-scale shuffle) and is pinned both
    ways in tests/test_plan_budgets.py.  The entry runs the join under
    CBO with stats; plan choice never changes values, which is what the
    oracle (same query over the raw parquet) checks."""
    _cbo_tables(spark, sf_dir)
    saved = {
        "spark.sql.cbo.enabled": spark.conf.get("spark.sql.cbo.enabled"),
        "spark.sql.cbo.joinReorder.enabled":
            spark.conf.get("spark.sql.cbo.joinReorder.enabled"),
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        df = spark.sql(_CBO_JOIN_SQL)
        # Force analysis/optimization/physical planning NOW, while CBO is
        # on — the DataFrame's QueryExecution caches the plan it gets here.
        df._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return df


@query(
    "dml_insert_values_params",
    oracle="""
    WITH base AS (
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      UNION ALL
      SELECT 900, 'PARAMLAND', 2
      UNION ALL
      SELECT 901, 'BINDVILLE', 4
    )
    SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
           MAX(n_name) AS last_name
    FROM base GROUP BY n_regionkey
    """,
    tags=("dml", "params", "slt"),
)
def dml_insert_values_params(spark, sf_dir):
    """Parameterized INSERT ... VALUES, mirroring the reference's
    insert_values_placeholders.slt (prepared-statement placeholders in
    DML position, not just SELECT — `sql_prepared_params` covers the
    query side).  Spark 4's named-parameter sql() binds :name markers
    server-side — the values never pass through string formatting, the
    same injection-safe contract as the reference's $1 placeholders.
    The table is dropped and rebuilt per call for determinism."""
    import os as _os
    import tempfile as _tempfile

    scratch = _os.path.join(
        _tempfile.gettempdir(), "datafusion_spark_dml", "nation_params"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    spark.sql("DROP TABLE IF EXISTS nation_params")
    nation.write.mode("overwrite").option("path", scratch).saveAsTable(
        "nation_params"
    )
    spark.sql(
        "INSERT INTO nation_params VALUES (:k1, :n1, :r1), (:k2, :n2, :r2)",
        args={"k1": 900, "n1": "PARAMLAND", "r1": 2,
              "k2": 901, "n2": "BINDVILLE", "r2": 4},
    )
    return (
        spark.table("nation_params")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"), F.max("n_name").alias("last_name"))
    )


@query(
    "catalog_table_types",
    oracle="""
    SELECT * FROM (VALUES
      ('ctt_view', 'TEMPORARY', true),
      ('nation_ctt', 'EXTERNAL', false)
    ) t(tbl, table_type, is_temporary)
    ORDER BY tbl
    """,
    tags=("catalog", "metadata", "slt"),
)
def catalog_table_types(spark, sf_dir):
    """Table-type metadata, mirroring the reference's
    information_schema_table_types.slt (BASE TABLE vs VIEW rows in
    information_schema.tables).  Spark's catalog exposes the same facts
    via listTables(): a registered temp view reports TEMPORARY, a
    path-backed saved table reports EXTERNAL.  The entry creates one of
    each and returns their catalog rows — metadata-only, zero data
    read."""
    import os as _os
    import tempfile as _tempfile

    nation = load_table(spark, sf_dir, "nation")
    nation.limit(5).createOrReplaceTempView("ctt_view")
    scratch = _os.path.join(
        _tempfile.gettempdir(), "datafusion_spark_dml", "nation_ctt"
    )
    spark.sql("DROP TABLE IF EXISTS nation_ctt")
    nation.limit(5).write.mode("overwrite").option("path", scratch).saveAsTable(
        "nation_ctt"
    )
    rows = [
        (t.name, t.tableType, bool(t.isTemporary))
        for t in spark.catalog.listTables()
        if t.name in ("ctt_view", "nation_ctt")
    ]
    return (
        values_df(spark, rows,
                  "tbl string, table_type string, is_temporary boolean")
        .orderBy("tbl")
    )

"""Official-schema TPC-H track: q2/q9/q11/q16/q20 structurally unmodified.

The driver testdata has no partsupp table, so the adapted suite in tpch.py
re-derives per-query substitutes and documents every deviation.  This module
closes the gap for the five partsupp-dependent queries: a partsupp relation
with the official columns (ps_partkey, ps_suppkey, ps_availqty,
ps_supplycost) is DERIVED deterministically from the distinct
(l_partkey, l_suppkey) pairs in lineitem — availqty/supplycost are pure
integer-arithmetic functions of the keys, so BOTH engines compute
bit-identical values from the same parquet inputs at ANY scale factor.

The query texts below are the reference's benchmarks/queries/q{2,9,11,16,20}
.sql with their join graphs, subquery structure (correlated min-cost in q2,
scalar HAVING threshold in q11, NOT-IN anti-join in q16, nested IN +
correlated quantity threshold in q20), aggregates, ORDER BY and LIMIT kept
intact.  Adaptations (all forced by missing columns, each noted inline):
p_mfgr/s_address/s_phone/s_comment/p_container don't exist -> nearest
existing column or dropped from the projection; region/nation/date constants
retargeted to the synthetic domains; money sums accumulate in DECIMAL(38,6)
per SURVEY §4.

Spark side: partsupp is materialized once per (session, sf_dir) to
spark-warehouse/derived_tpch/<sf>/partsupp.parquet and read back — queries
then scan a real parquet relation (stats, pushdown, broadcast all apply,
exactly what a prep step would do at 100 TB).  Oracle side: the SAME
derivation SQL runs as a WITH-prefix, so the gate needs no extra files.
"""

from __future__ import annotations

import os

from datafusion_spark.catalog import register_views
from datafusion_spark.queries.registry import query

# Deterministic partsupp derivation — identical SQL text for both engines.
# availqty in 1000..9999, supplycost in 1.00..1000.00 (2-dp, exact in
# double), both pure functions of the key pair.
_PARTSUPP_SQL = """
SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       CAST((l_partkey * 37 + l_suppkey * 13) % 9000 + 1000 AS BIGINT)
           AS ps_availqty,
       CAST((l_partkey * 7919 + l_suppkey * 104729) % 99900 + 100 AS DOUBLE)
           / 100.0 AS ps_supplycost
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
"""


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_partsupp(spark, sf_dir: str) -> None:
    """Register the derived partsupp as a temp view, materializing it to
    parquet on first use per sf_dir.

    The parquet materialization is the 100 TB shape (a one-off prep job;
    downstream queries scan a real file with stats + pushdown).  Concurrent
    writers (the sharded sweep) race benignly: each writes to a
    pid-suffixed temp dir and the first atomic rename wins.
    """
    register_views(spark, sf_dir)
    dest = os.path.join(
        _repo_root(), "spark-warehouse", "derived_tpch",
        os.path.basename(sf_dir.rstrip("/")), "partsupp.parquet",
    )
    if not os.path.isdir(dest):
        tmp = f"{dest}.tmp.{os.getpid()}"
        spark.sql(_PARTSUPP_SQL).coalesce(1).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dest)
        except OSError:  # another process won the race; use its output
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(dest).createOrReplaceTempView("partsupp")


def _register(name: str, sql: str, doc: str) -> None:
    def fn(spark, sf_dir, _sql=sql):
        _ensure_partsupp(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    fn.__doc__ = doc
    oracle = f"WITH partsupp AS ({_PARTSUPP_SQL}) {sql}"
    query(name, oracle=oracle, tags=("tpch", "official", "partsupp"))(fn)


# q2: minimum-cost supplier (reference benchmarks/queries/q2.sql).
# Adaptations: p_mfgr/s_address/s_phone/s_comment absent -> p_brand kept,
# address/phone/comment dropped from the projection; '%BRASS' -> a p_type
# suffix that exists; region EUROPE exists as-is.  The correlated scalar
# min-cost subquery over partsupp×supplier×nation×region is verbatim.
_register(
    "tpch_official_q2",
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey
      AND s_suppkey = ps_suppkey
      AND p_size = 15
      AND p_type LIKE '%ANDARD'
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT MIN(ps_supplycost)
          FROM partsupp, supplier, nation, region
          WHERE p_partkey = ps_partkey
            AND s_suppkey = ps_suppkey
            AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="""Official TPC-H q2 (reference benchmarks/queries/q2.sql) on the
    derived partsupp: correlated min-supplycost scalar subquery, 5-relation
    join, ORDER+LIMIT.  Spark decorrelates the subquery to an aggregate +
    rejoin on p_partkey; dims broadcast.  The full ORDER BY key
    (acctbal, n_name, s_name, p_partkey) is unique per row, so LIMIT 100
    is deterministic on both engines.""",
)

# q9: product-type profit (reference q9.sql).  Adaptations: profit
# accumulates in DECIMAL(38,6) (SURVEY §4 money rule); '%green%' -> '%red%'
# (the synthetic color vocabulary has no green).
_register(
    "tpch_official_q9",
    """
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - ps_supplycost * l_quantity AS amount
        FROM part, supplier, lineitem, partsupp, orders, nation
        WHERE s_suppkey = l_suppkey
          AND ps_suppkey = l_suppkey
          AND ps_partkey = l_partkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="""Official TPC-H q9 (reference benchmarks/queries/q9.sql) on the
    derived partsupp: 6-relation join through the (l_partkey, l_suppkey)
    composite into partsupp, per-nation-per-year profit.  The composite
    partsupp join co-partitions with lineitem's own keys; nation/part/
    supplier broadcast.  Profit rows are exact-representable doubles cast
    to DECIMAL(38,6) pre-SUM, so the aggregate is order-insensitive.""",
)

# q11: important inventory (reference q11.sql).  Adaptations: GERMANY ->
# NATION_7; the 0.0001/SF threshold fraction -> 0.001 (the synthetic
# partsupp is ~25x smaller per nation than official SF1); ORDER BY gains
# the ps_partkey tiebreaker required by SURVEY §4 (official text orders by
# value alone, which is nondeterministic under ties).
_register(
    "tpch_official_q11",
    """
    SELECT ps_partkey,
           CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6)))
                AS DOUBLE) AS value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY ps_partkey
    HAVING SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6))) > (
        SELECT SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,6))) * 0.001
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7')
    ORDER BY value DESC, ps_partkey
    """,
    doc="""Official TPC-H q11 (reference benchmarks/queries/q11.sql) on the
    derived partsupp: grouped inventory value filtered by a scalar-subquery
    fraction of the national total.  The scalar side broadcasts back; the
    group-by shuffles on ps_partkey only.""",
)

# q16: parts/supplier relationship (reference q16.sql).  Adaptations:
# Brand#45 -> Brand#21; 'MEDIUM POLISHED%' -> a p_type prefix that exists;
# p_size IN-list intersected with the synthetic 1..50 domain (official
# values kept where valid); the s_comment '%Customer%Complaints%' NOT-IN
# side has no comment column -> an s_name pattern keeps the anti-join
# structure.  COUNT(DISTINCT) cast BIGINT on both sides (SURVEY §4).
_register(
    "tpch_official_q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#21'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%0000009%')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="""Official TPC-H q16 (reference benchmarks/queries/q16.sql) on the
    derived partsupp: NOT-IN anti-join against a filtered supplier set,
    COUNT(DISTINCT) per (brand, type, size).  Spark plans the NOT IN as a
    null-aware anti join with the tiny supplier side broadcast.""",
)

# q20: potential part promotion (reference q20.sql).  Adaptations:
# 'forest%' -> 'red%'; CANADA -> NATION_3; the shipdate year window
# retargeted into the synthetic 1995-2001 domain; s_address absent ->
# s_name only in the projection.
_register(
    "tpch_official_q20",
    """
    SELECT s_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty > (
            SELECT 0.5 * SUM(l_quantity)
            FROM lineitem
            WHERE l_partkey = ps_partkey
              AND l_suppkey = ps_suppkey
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'))
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
    ORDER BY s_name
    """,
    doc="""Official TPC-H q20 (reference benchmarks/queries/q20.sql) on the
    derived partsupp: nested IN chains (supplier <- partsupp <- part) with
    a CORRELATED half-stock threshold over lineitem.  Spark decorrelates
    the threshold into an aggregate on (l_partkey, l_suppkey) joined back;
    both IN chains become (broadcast) semi joins.""",
)


# ---------------------------------------------------------------------------
# Derived lineitem extension: l_commitdate / l_receiptdate / l_shipmode.
#
# Same design as partsupp above: the official columns the synthetic lineitem
# lacks are pure deterministic functions of (l_orderkey, l_linenumber,
# l_shipdate), computed by IDENTICAL SQL text in both engines, so q4/q12/q21
# can run with their reference structure (EXISTS / NOT EXISTS anti-semantics,
# commit-before-receipt predicates, shipmode grouping) intact.
#   commitdate = shipdate + 1..25 days; receiptdate = commitdate - 4..+5 days
#   (≈40% of lines receive before commit — both branches of every predicate
#   are populated); shipmode cycles the 7 official modes.
# ---------------------------------------------------------------------------

_LINEITEM_EXT_SQL = """
SELECT *,
       CAST(l_shipdate + INTERVAL '1' DAY *
            ((l_orderkey * 7 + l_linenumber * 3) % 25 + 1) AS TIMESTAMP)
           AS l_commitdate,
       CAST(l_shipdate + INTERVAL '1' DAY *
            (((l_orderkey * 7 + l_linenumber * 3) % 25 + 1)
             + ((l_orderkey * 11 + l_linenumber * 5) % 10 - 4)) AS TIMESTAMP)
           AS l_receiptdate,
       CASE (l_orderkey * 3 + l_linenumber) % 7
            WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
            WHEN 3 THEN 'RAIL' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'FOB'
            ELSE 'REG AIR' END AS l_shipmode
FROM lineitem
"""


def _ensure_lineitem_ext(spark, sf_dir: str) -> None:
    """Materialize the extended lineitem once per sf_dir and shadow the
    ``lineitem`` view with it (official q4/q12/q21 reference the extra
    columns by the official table name)."""
    register_views(spark, sf_dir)
    dest = os.path.join(
        _repo_root(), "spark-warehouse", "derived_tpch",
        os.path.basename(sf_dir.rstrip("/")), "lineitem_ext.parquet",
    )
    if not os.path.isdir(dest):
        tmp = f"{dest}.tmp.{os.getpid()}"
        spark.sql(_LINEITEM_EXT_SQL).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dest)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(dest).createOrReplaceTempView("lineitem")


def _register_ext(name: str, sql: str, doc: str) -> None:
    def fn(spark, sf_dir, _sql=sql):
        _ensure_lineitem_ext(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    fn.__doc__ = doc
    # DuckDB treats a CTE named like its own source as circular; qualify
    # the inner scan with the main schema (text otherwise identical).
    ext_for_duck = _LINEITEM_EXT_SQL.replace("FROM lineitem", "FROM main.lineitem")
    oracle = f"WITH lineitem AS ({ext_for_duck}) {sql}"
    query(name, oracle=oracle, tags=("tpch", "official", "lineitem-ext", "bench"))(fn)


# q4: order-priority checking (reference benchmarks/queries/q4.sql).
# Adaptations: the quarter window retargeted into the synthetic 1995-2001
# o_orderdate domain.  EXISTS, grouping, ORDER BY are verbatim; the output
# is counts only, so the oracle comparison is exact.
_register_ext(
    "tpch_official_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= '1996-07-01'
      AND o_orderdate < DATE '1996-07-01' + INTERVAL '3' MONTH
      AND EXISTS (
          SELECT * FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="""Official TPC-H q4 (reference benchmarks/queries/q4.sql) on the
    derived commit/receipt dates: EXISTS over lineitem -> left-semi hash
    join on l_orderkey (lineitem side projected to 3 columns pre-shuffle),
    then a 5-group aggregate.  Counts-only output -> exact oracle match.""",
)

# q12: shipping modes and order priority (reference q12.sql).  Adaptations:
# receipt-year window retargeted (1994 -> 1997).  The two-branch CASE sums,
# MAIL/SHIP filter and join are verbatim; counts-only output.
_register_ext(
    "tpch_official_q12",
    """
    SELECT l_shipmode,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                     AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
               AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l_commitdate < l_receiptdate
      AND l_shipdate < l_commitdate
      AND l_receiptdate >= DATE '1997-01-01'
      AND l_receiptdate < DATE '1997-01-01' + INTERVAL '1' YEAR
    GROUP BY l_shipmode
    ORDER BY l_shipmode
    """,
    doc="""Official TPC-H q12 (reference benchmarks/queries/q12.sql) on the
    derived shipmode/commit/receipt columns: selective IN + three date
    predicates reach the parquet scan, the orders join carries only
    (o_orderkey, o_orderpriority), conditional-sum aggregate.  BIGINT sums
    -> exact oracle match.""",
)

# q21: suppliers who kept orders waiting (reference q21.sql).  Adaptations:
# SAUDI ARABIA -> NATION_4.  The signature EXISTS (another supplier on the
# order) + NOT EXISTS (no OTHER late supplier) pair, F-status filter, count
# ranking and LIMIT are verbatim.
_register_ext(
    "tpch_official_q21",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_receiptdate > l1.l_commitdate
      AND EXISTS (
          SELECT * FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT * FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_receiptdate > l3.l_commitdate)
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_4'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="""Official TPC-H q21 (reference benchmarks/queries/q21.sql) on the
    derived commit/receipt dates: the hardest TPC-H shape — fact self-joins
    as EXISTS (left-semi, <> on suppkey) and NOT EXISTS (left-anti), both
    co-partitioned on l_orderkey so AQE plans one exchange per side;
    supplier/nation broadcast.  (s_name, numwait) ordering has unique
    s_name -> deterministic LIMIT.  Counts-only output -> exact match.""",
)

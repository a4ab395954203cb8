"""Native ``WITH RECURSIVE`` through the SQL frontend (Spark 4.x).

Reference: datafusion/sql/ parses WITH RECURSIVE into RecursiveQueryExec
(physical-plan/src/recursive_query.rs).  Round 1 implemented recursion as a
Python fixpoint operator (operators/recursive.py — kept, and still oracle-
checked by recursive_tree_depth / recursive_org_hierarchy); these entries
prove the SQL SURFACE: the same queries written as WITH RECURSIVE text and
executed by spark.sql, so a reference user's recursive SQL runs unchanged.

Scale: Spark's UnionLoop executes each iteration as a distributed join —
the per-level frontier is broadcast when small (AQE), the edge relation is
never re-shuffled; depth bounds the iteration count exactly as in the
fixpoint operator.
"""

from __future__ import annotations

from datafusion_spark.catalog import register_views
from datafusion_spark.queries.registry import query


@query(
    "recursive_sql_tree_depth",
    oracle="""
    WITH RECURSIVE t(node, depth) AS (
      SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT e.node, t.depth + 1
      FROM (SELECT range AS node, range // 2 AS parent FROM range(2, 1024)) e
      JOIN t ON e.parent = t.node
    )
    SELECT node, depth FROM t
    """,
    tags=("recursive", "sql-frontend"),
)
def recursive_sql_tree_depth(spark, sf_dir):
    """BFS depth of a 1023-node binary tree via native WITH RECURSIVE —
    same semantics as recursive_tree_depth (Python fixpoint), parsed and
    executed entirely by the SQL frontend."""
    return spark.sql("""
      WITH RECURSIVE t(node, depth) AS (
        SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT e.node, t.depth + 1
        FROM (SELECT id AS node, id DIV 2 AS parent FROM range(2, 1024)) e
        JOIN t ON e.parent = t.node
      )
      SELECT node, depth FROM t
    """)


@query(
    "recursive_sql_org_hierarchy",
    oracle="""
    WITH RECURSIVE h(c_custkey, root_key, depth) AS (
      SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT), CAST(0 AS BIGINT)
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT CAST(c.c_custkey AS BIGINT), h.root_key, h.depth + 1
      FROM customer c
      JOIN h ON CAST(c.c_custkey AS BIGINT) // 10 = h.c_custkey
      WHERE c.c_custkey >= 10
    )
    SELECT c_custkey, root_key, depth FROM h
    """,
    tags=("recursive", "sql-frontend"),
)
def recursive_sql_org_hierarchy(spark, sf_dir):
    """Org-chart ancestry over the customer table via native WITH
    RECURSIVE (SQL-surface twin of recursive_org_hierarchy)."""
    register_views(spark, sf_dir)
    return spark.sql("""
      WITH RECURSIVE h(c_custkey, root_key, depth) AS (
        SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT),
               CAST(0 AS BIGINT)
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT CAST(c.c_custkey AS BIGINT), h.root_key, h.depth + 1
        FROM customer c
        JOIN h ON CAST(c.c_custkey AS BIGINT) DIV 10 = h.c_custkey
        WHERE c.c_custkey >= 10
      )
      SELECT c_custkey, root_key, depth FROM h
    """)

"""Recursive CTE entries (reference: datafusion/physical-plan/src/
recursive_query.rs; sqllogictest test_files/cte.slt `WITH RECURSIVE`).

Spark side runs operators/recursive.py's iterative fixpoint; the oracle is
DuckDB's native ``WITH RECURSIVE`` — so these entries check that the loop
reproduces true recursive-query semantics, not just a hand-unrolled join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.operators.recursive import recursive_fixpoint
from datafusion_spark.queries.registry import query


@query(
    "recursive_tree_depth",
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
    tags=("recursive",),
)
def recursive_tree_depth(spark, sf_dir):
    """BFS depth of every node of a 1023-node binary tree (parent = n div 2).

    Each iteration: edges ⋈ frontier — AQE broadcasts the frontier, so the
    edge table is never shuffled; 10 iterations for 10 levels."""
    edges = spark.range(2, 1024).select(
        F.col("id").alias("node"), F.expr("id div 2").alias("parent")
    )
    base = spark.range(1, 2).select(
        F.col("id").alias("node"), F.lit(0).cast("long").alias("depth")
    )

    def step(frontier):
        return edges.join(
            frontier.select(F.col("node").alias("p"), "depth"),
            edges.parent == F.col("p"),
        ).select("node", (F.col("depth") + F.lit(1)).alias("depth"))

    return recursive_fixpoint(base, step, max_iter=16)


@query(
    "recursive_org_hierarchy",
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
    tags=("recursive",),
)
def recursive_org_hierarchy(spark, sf_dir):
    """Hierarchy over real data: customer c (key ≥ 10) reports to
    c_custkey div 10; keys 0..9 are roots (key 0 would otherwise be its own
    parent — the ≥10 guard breaks that cycle on both engines).  Computes
    each customer's root ancestor + depth — the classic org-chart CTE."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").cast("long").alias("c_custkey"))
        .localCheckpoint(eager=False)
    )
    base = cust.filter(F.col("c_custkey") < 10).select(
        "c_custkey",
        F.col("c_custkey").alias("root_key"),
        F.lit(0).cast("long").alias("depth"),
    )

    def step(frontier):
        f = frontier.select(F.col("c_custkey").alias("parent"), "root_key", "depth")
        return (
            cust.filter(F.col("c_custkey") >= 10)
            .join(f, F.expr("c_custkey div 10") == F.col("parent"))
            .select("c_custkey", "root_key", (F.col("depth") + F.lit(1)).alias("depth"))
        )

    return recursive_fixpoint(base, step, max_iter=16)

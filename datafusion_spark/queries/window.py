"""Window functions: ranking, offsets, frames, running aggregates.

Reference parity: datafusion/functions-window/src/ (row_number, rank,
dense_rank, percent_rank, cume_dist, ntile, lead/lag, nth_value) and
datafusion/physical-plan/src/windows/.

Determinism: every ORDER BY inside a window spec is a unique total order
(tie-broken by a key column) so offset/frame functions are well-defined;
running sums accumulate in decimal.  Scale: window partitions hash-shuffle
on the partition key — partition keys here (custkey/suppkey/user_id) have
high cardinality, so no single-partition bottleneck; none of these specs
use a global (un-partitioned) ORDER BY except the explicitly-global ntile
demo, which at 100 TB would be replaced by approx quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.helpers import DEC
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_row_number_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def window_row_number_latest(spark, sf_dir):
    """Latest order per customer — the canonical keep-one dedup pattern."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "window_rank_dense_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
      FROM orders) t
    WHERE rnk <= 3
    """,
    tags=("window", "rank"),
)
def window_rank_dense_rank(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           LAG(l_extendedprice) OVER w AS prev_price,
           LEAD(l_extendedprice) OVER w AS next_price
    FROM lineitem
    WHERE l_suppkey <= 5
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
    tags=("window", "offset"),
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.lag("l_extendedprice").over(w).alias("prev_price"),
            F.lead("l_extendedprice").over(w).alias("next_price"),
        )
    )


@query(
    "window_moving_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS qty_4row_sum
    FROM lineitem
    WHERE l_suppkey <= 5
    """,
    tags=("window", "frame"),
)
def window_moving_sum(spark, sf_dir):
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, 0)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("qty_4row_sum"),
        )
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    WHERE o_custkey <= 100
    """,
    tags=("window", "frame"),
)
def window_running_total(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
        )
    )


@query(
    "window_ntile_percentiles",
    oracle="""
    SELECT quartile, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer) t
    GROUP BY quartile
    """,
    tags=("window", "rank"),
)
def window_ntile_percentiles(spark, sf_dir):
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select("c_acctbal", F.ntile(4).over(w).cast("long").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )


@query(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cume
    FROM supplier
    """,
    tags=("window", "rank"),
)
def window_percent_rank_cume_dist(spark, sf_dir):
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "offset"),
)
def window_first_last_nth(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .distinct()
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal
    FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark, sf_dir):
    """Top-3 customers by balance per nation — the QUALIFY idiom.  At scale
    this is the shuffle-once pattern; contrast with a self-join top-k which
    shuffles twice."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "c_acctbal")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    WHERE o_custkey < 200
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over event time (per-customer trailing-30-day spend) —
    value-based frames are DataFusion's window_frame RANGE mode
    (physical-plan/src/windows/).  RANGE includes ALL rows with equal
    order keys, so ties don't need a tiebreak for determinism; the sum is
    decimal-accumulated (exact) per SURVEY §4."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.expr(
            """
            CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate
              RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
            ) AS DOUBLE)
            """
        ).alias("spend_30d"),
    )


@query(
    "window_groups_frame",
    oracle="""
    WITH days AS (
      SELECT event_id, event_type, date_trunc('day', ts) AS day,
             dense_rank() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('day', ts)) AS dr
      FROM events WHERE event_id < 5000
    )
    SELECT event_id, event_type, day,
           CAST(count(*) OVER w AS BIGINT) AS n_in_group_window,
           CAST(sum(event_id) OVER w AS BIGINT) AS sum_in_group_window
    FROM days
    WINDOW w AS (PARTITION BY event_type ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    """,
    tags=("window", "frames", "groups"),
)
def window_groups_frame(spark, sf_dir):
    """GROUPS window frame (reference: datafusion/physical-plan windows
    support GROUPS BETWEEN; SQL:2016 T620).  Neither Spark nor DuckDB
    parses GROUPS — the portable emulation is the point: dense_rank gives
    each peer group an integer coordinate, then a RANGE frame over that
    coordinate is exactly GROUPS (frame = neighboring VALUE groups, not
    neighboring rows).  Scale: two window passes over the same partition
    key → one shuffle, the second pass reuses the partitioning+sort."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    day = F.date_trunc("day", F.col("ts"))
    wd = Window.partitionBy("event_type").orderBy("day")
    days = e.select("event_id", "event_type", day.alias("day")).withColumn(
        "dr", F.dense_rank().over(wd)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("dr")
        .rangeBetween(-1, 1)
    )
    return days.select(
        "event_id",
        "event_type",
        "day",
        F.count(F.lit(1)).over(wf).alias("n_in_group_window"),
        F.sum("event_id").over(wf).alias("sum_in_group_window"),
    )


@query(
    "window_array_agg_sliding",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           array_to_string(list(CAST(l_quantity AS INT)) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ',') AS qty_trail3,
           CAST(len(list(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS INT)
             AS trail_len
    FROM lineitem
    WHERE l_suppkey <= 5
    """,
    tags=("window", "frame", "array"),
)
def window_array_agg_sliding(spark, sf_dir):
    """array_agg over a sliding ROWS frame (reference: sqllogictest
    array_agg_sliding_window.slt and spark/aggregate/collect_window.slt —
    DataFusion's retractable ARRAY_AGG
    accumulator).  Spark's collect_list over a bounded frame is the same
    retract/append window state; the frame's ORDER BY is a unique total
    order (§4 rule 6) so the produced arrays are deterministic on both
    engines.  Scale: bounded frame → O(frame) state per row, single
    shuffle on the partition key."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, 0)
    )
    trail = F.collect_list(F.col("l_quantity").cast("int")).over(w)
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.array_join(trail, ",").alias("qty_trail3"),
            F.size(trail).alias("trail_len"),
        )
    )


@query(
    "window_distinct_count",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS BIGINT)
             AS distinct_supps,
           CAST(count(DISTINCT l_returnflag) OVER (PARTITION BY l_orderkey) AS BIGINT)
             AS distinct_flags
    FROM lineitem
    WHERE l_orderkey < 2000
    """,
    tags=("window", "distinct"),
)
def window_distinct_count(spark, sf_dir):
    """COUNT(DISTINCT) OVER a partition (reference: sqllogictest
    window.slt distinct-aggregate-over-window cases).  Spark's window
    exec rejects DISTINCT aggregates, so the standard re-expression is
    ``size(collect_set(x) OVER w)`` — collect_set is the dedup state a
    native distinct-window accumulator would keep, and size() reads it
    per row.  Scale: state is O(distinct values per partition key), same
    as the native operator; one shuffle on the partition key."""
    w = Window.partitionBy("l_orderkey")
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.size(F.collect_set("l_suppkey").over(w))
            .cast("long")
            .alias("distinct_supps"),
            F.size(F.collect_set("l_returnflag").over(w))
            .cast("long")
            .alias("distinct_flags"),
        )
    )


@query(
    "window_limits_prefix",
    oracle="""
    SELECT o_orderkey,
           lead(o_orderkey)    OVER w AS next_key,
           lead(o_orderkey, 2) OVER w AS next2_key,
           lag(o_orderkey)     OVER w AS prev_key,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
                (ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    WINDOW w AS (ORDER BY o_orderkey)
    ORDER BY o_orderkey
    LIMIT 50
    """,
    tags=("window", "limits"),
)
def window_limits_prefix(spark, sf_dir):
    """LIMIT over a globally-ordered window query, mirroring the
    reference's window_limits.slt (sqllogictest/test_files/
    window_limits.slt: enable_window_limits rewrites the scan to
    TopK(fetch = limit + max offset) under the window, asserting values
    are unchanged).  Spark has no such rewrite, so this entry IMPLEMENTS
    it declaratively: lead(<=2) / lag / row_number / preceding-frame
    running sum over the first 50 keys need only the first 52 rows, so
    the window runs over orderBy().limit(52) — which Spark plans as a
    distributed TakeOrderedAndProject, never a full-table global-order
    window — then trims to 50.  The oracle computes the window over the
    FULL table and limits after, so the comparison proves the rewrite
    preserves values (the slt's exact assertion).  The trailing NULL
    lead slots at rows 51/52 are outside the final 50, mirroring the
    fetch = limit + offset bound."""
    limit_n, max_off = 50, 2
    base = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(limit_n + max_off)
    )
    w = Window.orderBy("o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        base.select(
            "o_orderkey",
            F.lead("o_orderkey").over(w).alias("next_key"),
            F.lead("o_orderkey", 2).over(w).alias("next2_key"),
            F.lag("o_orderkey").over(w).alias("prev_key"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum(F.col("o_totalprice").cast(DEC)).over(wf)
            .cast("double").alias("running_total"),
        )
        .orderBy("o_orderkey")
        .limit(limit_n)
    )

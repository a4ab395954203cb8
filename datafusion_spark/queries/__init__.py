"""Query/operator inventory registry.

Every implemented operator from SURVEY.md §2 registers itself here with:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan)
  - optionally a DuckDB-compatible ANSI-SQL oracle string (the correctness
    gate compares row count + schema + order-insensitive value hash)

Import this package to populate the registries; ``__spark_entry__.py`` at
the repo root re-exports them for the driver.
"""

from __future__ import annotations

import glob
import importlib
import json
import os

from datafusion_spark.queries.registry import ORACLES, QUERIES, TAGS, query

_MODULES = [
    "tpch",
    "tpch_official",
    "relational",
    "window",
    "window_h2o",
    "functions_scalar",
    "functions_encoding",
    "functions_agg",
    "nested",
    "events",
    "clickbench",
    "clickbench_full",
    "clickbench_extended",
    "job_suite",
    "pipeline_dedup",
    "pipeline_similarity",
    "pipeline_text",
    "pipeline_multimodal",
    "sources_io",
    "recursive_cte",
    "recursive_sql",
    "catalog_meta",
    "udf_ops",
    "functions_extended",
    "advanced_ops",
    "functions_spark_compat",
    "functions_edge",
    "compat_sql",
    "tpcds_planning",
    "tpcds_exec",
]


def _load_all() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(f"datafusion_spark.queries.{mod}")
        except ModuleNotFoundError as e:
            # Module not written yet (incremental build); only swallow our own.
            if f"queries.{mod}" not in str(e):
                raise


def _driver_verified() -> set[str]:
    """Entry names already hash-verified GREEN by the driver in a past round.

    Read from the ``CORRECTNESS_r*.json`` files the driver leaves at the repo
    root; latest round wins per entry, and only a passing record
    (``hash_match`` true, or rows+schema for oracle-less rows-only entries)
    counts — an entry that FAILED its latest check re-enters the front of the
    prefix so the fix gets re-verified next round.  Missing/corrupt files
    degrade to "never verified" (empty set) — ordering is a
    verification-coverage optimisation, never a correctness one.
    """
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                records = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in records.items():
            if isinstance(rec, dict):
                ok = bool(
                    rec.get("hash_match")
                    or (rec.get("hash_match") is None and rec.get("rows_match"))
                )
            else:
                ok = True  # unknown record shape: don't churn the prefix
            latest[name] = ok
    return {name for name, ok in latest.items() if ok}


def _interleave_families() -> None:
    """Reorder the registries: unverified oracle-checkable entries first,
    round-robin across modules (families) within each tier.

    The driver's correctness sweep walks the registry in insertion order and
    truncates at a 50-entry budget.  Two goals:

    1. Every prefix covers every operator family (round-robin interleave).
    2. The 50-entry prefix lands on entries that have NEVER had a driver
       hash-check row in a previous round (read from CORRECTNESS_r*.json),
       and never on ``oracle=None`` rows the driver can only row-count —
       so cumulative hard-signal coverage grows ~50 entries per round.
    """
    verified = _driver_verified()

    # Hand-pinned front of the prefix for the CURRENT round (r6): the two r5
    # FAILs (fixed, need driver re-verification), the 8 TPC-DS exec entries
    # that landed after the r5 prefix snapshot, the new r6 TPC-DS tranche,
    # and the new r6 slt-mirror families.  Rotate per round; harmless if an
    # entry is already verified (it drops to tier 1/2 automatically) or not
    # yet registered (tier() is only consulted for registered names).
    priority = {
        "fn_edge_limit_corners",       # r5 FAIL: HUGEINT sum now CAST BIGINT
        "fn_edge_array_minmax_ops",    # r5 ERR: arrays now rendered to text
        "agg_edge_filter_distinct",    # flushed by the r6 hardened lint:
        "agg_minmax_nested",           #   top-level ARRAY columns now rendered
        "similarity_pq_encode",        #   to text on both engine sides
        "tpcds_q15",                   # landed after the r5 prefix snapshot
        "tpcds_q45",
        "tpcds_q56",
        "tpcds_q60",
        "tpcds_q33",
        "tpcds_q71",
        "tpcds_q79",
        "tpcds_q68",
        "tpcds_q1",                    # new r6 executed tranche
        "tpcds_q13",
        "tpcds_q36",
        "tpcds_q48",
        "tpcds_q62",
        "tpcds_q86",
        "tpcds_q99",
        "tpcds_q6",
        "tpcds_q59",
        "tpcds_q43",
        "tpcds_q41",
        "tpcds_q82",
        "agg_topk_min_max_groups",     # new r6 aggregates_topk.slt mirror
        "join_limit_pushdown",         # new r6 join_limit_pushdown.slt mirror
        "source_nested_schema_pruning",  # new r6 nested-projection-pruning pin
        "source_parquet_cdc_chunking",   # new r6 parquet CDC adjudication
        "tpcds_q2",                    # r6 second tranche: year-over-year
        "tpcds_q74",                   #   customer CTEs + weekly pivots
        "tpcds_q11",
        "tpcds_q4",
        "tpcds_q38",                   #   three-channel INTERSECT/EXCEPT
        "tpcds_q87",
        "tpcds_q53",                   #   monthly class reports + windows
        "tpcds_q63",
        "tpcds_q89",
        "tpcds_q47",
        "tpcds_q57",
        "tpcds_q25",                   #   returns-family 3-fact chains
        "tpcds_q29",
        "tpcds_q17",
        "tpcds_q50",
        "tpcds_q93",
        "tpcds_q32",                   #   correlated-discount + inventory
        "tpcds_q92",
        "tpcds_q37",
        "tpcds_q61",
        "tpcds_q58",
        "tpcds_q30",                   #   state-return outliers + inventory
        "tpcds_q81",
        "tpcds_q83",
        "tpcds_q31",
        "tpcds_q27",
        "tpcds_q28",
        "tpcds_q22",
        "tpcds_q21",
        "tpcds_q39",
        "tpcds_q97",                   #   channel overlap + ship/demographics
        "tpcds_q9",
        "tpcds_q90",
        "tpcds_q16",
        "tpcds_q94",
        "tpcds_q95",
        "tpcds_q69",
        "tpcds_q10",
        "tpcds_q35",
        "tpcds_q18",
        "tpcds_q46",                   #   city baskets / profile chains
        "tpcds_q84",
        "tpcds_q91",
        "tpcds_q40",
        "tpcds_q76",
        "tpcds_q85",
        "tpcds_q44",                   #   rank zips / cumulative crossovers
        "tpcds_q51",
        "tpcds_q70",
        "tpcds_q67",
        "tpcds_q49",
    }

    def tier(name: str) -> int:
        if name in priority and name in ORACLES:
            return 0  # even if verified before: these changed this round
        if name not in ORACLES or name in verified:
            return 2
        return 1

    by_mod: dict[str, list[str]] = {m: [] for m in _MODULES}
    for name, fn in QUERIES.items():
        by_mod.setdefault(fn.__module__.rsplit(".", 1)[-1], []).append(name)
    # Keep registration order for known modules; append any module not listed
    # in _MODULES so its entries can never silently vanish from the registry.
    extra = [m for m in by_mod if m not in _MODULES and by_mod[m]]
    mods = [m for m in _MODULES if by_mod.get(m)] + sorted(extra)
    order: list[str] = []
    for t in (0, 1, 2):
        cols = [[n for n in by_mod[m] if tier(n) == t] for m in mods]
        cols = [c for c in cols if c]
        # Proportional (fair-share) interleave: entry i of an n-entry family
        # sorts at fraction (i+1)/n, so a family with 2× the unverified
        # backlog contributes 2× the prefix slots — big blocks (job_suite
        # ~100 unverified, clickbench_full ~37) drain proportionally faster
        # while every family still appears in each prefix.  Module position
        # breaks ties so the order stays deterministic.
        keyed = [
            ((i + 1) / len(c), j, n)
            for j, c in enumerate(cols)
            for i, n in enumerate(c)
        ]
        order.extend(n for _, _, n in sorted(keyed))
    if len(order) != len(QUERIES):
        raise RuntimeError(
            f"registry reorder dropped entries: {len(order)} != {len(QUERIES)}"
        )
    for reg in (QUERIES, ORACLES, TAGS):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in order if n in snap})


_load_all()
_interleave_families()

__all__ = ["QUERIES", "ORACLES", "TAGS", "query"]

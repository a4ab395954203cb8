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

    # Hand-pinned front of the prefix for the CURRENT round: fixed failures
    # that need driver re-verification, entries whose oracle just changed,
    # and newly-added corner families.  Rotate per round; harmless if an
    # entry is already verified (it drops to tier 1/2 automatically).
    priority = {
        "compat_sql_vectors",          # r4 FAIL, -0.0 normalization fix (r5)
        "multimodal_image_resize",     # last multimodal VALUES oracle unverified
        "multimodal_frame_sample",
        "multimodal_audio_features",
        "fn_edge_negative_zero",       # new r5 corner families
        "window_lead_lag_extreme_offsets",
        "fn_edge_string_numeric_coercion",
        "fn_edge_type_coercion",
        "fn_edge_in_list_typed",
        "window_limits_prefix",
        "dedup_minhash_lsh_pairs",     # r5 bucket-cap change to the plan
        "nested_vector_elementwise",   # latent -0.0 flushed by the hardened sweep (r5)
        "pg_compat_dialect",           # new r5 pg_compat family
        "fn_edge_timestamp_tz_parse",
        "fn_edge_floor_preimage",
        "subquery_correlated_corners",
        "fn_spark_trig_inverse",       # new r5 spark/-dir mirrors
        "fn_spark_round_modes",
        "fn_spark_reflect_misc",
        "fn_spark_nondet_invariants",
        "fn_edge_operator_matrix",     # new r5 general corner families
        "setop_union_type_coercion",
        "sort_group_by_ordinals",
        "source_dynamic_partition_prune",  # new r5 DPP scale entry
        "fn_edge_limit_corners",
        "agg_edge_constant_group",
        "fn_spark_datetime_ctor_aliases",  # r5: +to_timestamp_ltz/localtimestamp
        "join_array_keys",                 # new r5 array-key join family
        "dedup_incremental_lsh",           # new r5 incremental-ingest dedup
        "join_empty_side_propagation",
        "fn_edge_datetime_arith_matrix",
        "tpcds_planning_sweep",            # new r5 TPC-DS planning parity
        "tpcds_q3",                        # new r5 executed TPC-DS subset
        "tpcds_q42",
        "tpcds_q52",
        "tpcds_q55",
        "tpcds_q98",
        "tpcds_q12",
        "tpcds_q20",
        "tpcds_q96",
        "tpcds_q7",
        "tpcds_q26",
        "tpcds_q34",
        "tpcds_q65",
        "tpcds_q73",
        "fn_edge_array_minmax_ops",
        "tpcds_q88",
        "tpcds_q19",
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
        depth = max((len(c) for c in cols), default=0)
        for i in range(depth):
            for c in cols:
                if i < len(c):
                    order.append(c[i])
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

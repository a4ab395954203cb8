"""Table catalog over the driver-generated parquet data.

DataFusion exposes tables through SessionContext::register_parquet /
register_listing_table (reference: datafusion/datasource-parquet/src/mod.rs,
datafusion/catalog-listing).  Spark-native equivalent: ``spark.read.parquet``
which gives us predicate pushdown, column pruning, partition pruning and
vectorized Arrow-compatible scans for free.

At 100 TB these tables would be directory-partitioned (e.g. orders by
o_orderdate month); ``spark.read.parquet`` on a directory picks up hive-style
partition columns automatically, so nothing here changes — only the paths do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins.  At 100 TB
# region/nation stay tiny (fixed cardinality); supplier/part/customer grow but
# remain orders of magnitude smaller than the fact tables.
BROADCAST_TABLES = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Sessions already given runtime knobs (keyed by applicationId): the driver
# may call queries() on a session built WITHOUT session.tune() — Spark's
# 200-partition default then pays 6x task overhead per shuffle at sf0.01.
_TUNED: set[str] = set()


def ensure_runtime_tuned(spark: SparkSession) -> None:
    """Apply the runtime-settable engine defaults once per session.

    Only knobs still at their Spark defaults are touched (a session built
    via session.tune() or deliberately configured by the caller is
    respected).  Session time zone is pinned UTC unconditionally: event-time
    semantics here define timestamps as epoch-UTC wall values, and a
    non-UTC session would shift them when NTZ parquet is reinterpreted as
    TIMESTAMP (see load_table's events path)."""
    app = spark.sparkContext.applicationId
    if app in _TUNED:
        return
    _TUNED.add(app)
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    if conf.get("spark.sql.shuffle.partitions", "200") == "200":
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        conf.set("spark.sql.shuffle.partitions", cpus)
    # AQE + partition coalescing default to "true" since Spark 3.2 — setting
    # them is a no-op UNLESS the caller deliberately disabled them, so guard
    # exactly like shuffle.partitions above: a non-default ("false") value is
    # a caller decision and is respected.
    for knob in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ):
        if conf.get(knob, "true") == "true":
            conf.set(knob, "true")
    # Estimate correction for compressed parquet (see session.py): only
    # applied if still at the 1.0 default, so a deliberate caller value wins.
    if conf.get("spark.sql.sources.fileCompressionFactor", "1.0") == "1.0":
        conf.set("spark.sql.sources.fileCompressionFactor", "6.0")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Resolved base-table relations per (applicationId, sf_dir, table, mtime_ns).
# Creating a parquet relation costs ~0.15-0.4 s of DRIVER work per call even
# warm (py4j + file listing + a footer-read schema-inference job) — measured
# r12; a whole bench run pays it hundreds of times.  Caching the resolved
# DataFrame is the DataFrame-path twin of register_views()' per-session view
# cache (and of DataFusion's register_parquet, which lists once at
# registration): pure plan/metadata reuse — every execution still scans the
# parquet files.  The path's mtime_ns keys the entry so a regenerated table
# (make_scale_data overwriting a scratch sf_dir mid-session) is re-resolved,
# never served from a stale file index.
_RELATION_CACHE: dict[tuple[str, str, str, int], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Filters/projections compose onto this scan and reach
    the parquet reader via Catalyst (check .explain: PushedFilters/ReadSchema)."""
    ensure_runtime_tuned(spark)
    path = table_path(sf_dir, name)
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1  # missing path: let spark.read raise its own error
    key = (spark.sparkContext.applicationId, sf_dir, name, mtime)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    df = _read_table(spark, sf_dir, name)
    _RELATION_CACHE[key] = df
    return df


def cached_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Resolved-relation cache for persisted parquet ARTIFACT path(s) (index
    segments, codes, trained-model tables): same metadata-only reuse as
    load_table — the ~0.15-0.4 s of driver-side listing + footer schema
    inference per spark.read.parquet call — keyed by each path's mtime_ns
    so any rewrite re-resolves.  Execution still scans the parquet files
    fresh on every action.  Use only for artifacts that are stable within
    a session — per-invocation scratch (fresh directory each call) gains
    nothing and would grow the cache."""
    def _mt(p: str) -> int:
        try:
            return os.stat(p).st_mtime_ns
        except OSError:
            return -1
    key = (spark.sparkContext.applicationId, "",
           tuple((p, _mt(p)) for p in paths))
    cached = _RELATION_CACHE.get(key)
    if cached is None:
        cached = spark.read.parquet(*paths)
        _RELATION_CACHE[key] = cached
    return cached


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects outright) or TIMESTAMP(MICROS)
        # depending on the generator version.  Read with nanosAsLong so the
        # nanos variant arrives as a raw long, then convert only if needed —
        # the values are microsecond-resolution so ns→us division is lossless.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Event-time semantics assume epoch-UTC wall values; force the session
        # tz so NTZ→LTZ reinterpretation below is value-preserving no matter
        # how the session was built (a non-UTC session would silently shift
        # event times).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Read micros-NTZ parquet directly as TIMESTAMP (LTZ): same epoch
        # micros bit-for-bit under a UTC session, but WITHOUT a conversion
        # projection over the scan — so ts predicates (window pruning, time
        # filters) reach the parquet reader as PushedFilters.  The previous
        # cast-based shim blocked pushdown on every events query, which at
        # 100 TB means a full scan for any time-sliced query.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


# Current temp-view state per session: applicationId -> (sf_dir, shadows).
# ``shadows`` is the set of base-table names whose view has been replaced by
# a derived overlay (tpch_official).  register_views() is a no-op when the
# session already has the plain views for the same sf_dir — per-call
# re-registration was the dominant fixed cost of spark.sql entries in bench
# (10 parquet opens per call).
_VIEW_STATE: dict[str, tuple[str, frozenset]] = {}

_PLAIN = frozenset()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql(...) can see them —
    the equivalent of DataFusion's SessionContext::register_table.

    Cached per (session, sf_dir): skipped when this session already holds
    the un-shadowed views for this sf_dir.  Anything that replaces a
    base-named view must call note_view_shadows()/invalidate_views() so the
    next caller re-registers."""
    app = spark.sparkContext.applicationId
    if _VIEW_STATE.get(app) == (sf_dir, _PLAIN):
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEW_STATE[app] = (sf_dir, _PLAIN)


def note_view_shadows(spark: SparkSession, sf_dir: str, shadows) -> None:
    """Record that base-named temp views are currently shadowed by derived
    overlays (and for which sf_dir), so plain register_views() re-registers
    and overlay installers can skip redundant re-installation."""
    _VIEW_STATE[spark.sparkContext.applicationId] = (sf_dir, frozenset(shadows))


def view_state(spark: SparkSession):
    """Current (sf_dir, shadow-set) for this session, or None if unknown."""
    return _VIEW_STATE.get(spark.sparkContext.applicationId)


def invalidate_views(spark: SparkSession) -> None:
    """Forget this session's view state (e.g. a caller registered an
    arbitrary DataFrame under a base table name)."""
    _VIEW_STATE.pop(spark.sparkContext.applicationId, None)

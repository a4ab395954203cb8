"""A DataFusion-style ``SessionContext`` backed by a ``SparkSession``.

The reference's primary user entry point (datafusion/core/src/execution/
context/mod.rs; mirrored by the public Python bindings) is a session object
with ``sql`` / ``register_*`` / ``read_*`` / ``table`` methods.  This class
exposes that exact surface so a reference user's driver program ports by
changing one import; every method returns an ordinary Spark ``DataFrame``
(the reference DataFrame's verb set — select / filter / join / sort /
limit / union / distinct / count / collect / show / to_pandas via
``toPandas`` — is native Spark DataFrame surface already).

``sql`` runs DataFusion-dialect text through
:func:`datafusion_spark.compat.dialect.translate_sql` first, so queries
written against the reference (function spellings, chrono formats,
``arrow_cast`` …) execute unmodified, planned and optimized by Catalyst.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from datafusion_spark.compat.dialect import DialectError, translate_sql

_COPY_RE = re.compile(
    r"(?is)^\s*COPY\s+(?P<src>\(.*\)|[\w.\"`]+)\s+TO\s+'(?P<path>[^']+)'\s*"
    r"(?:STORED\s+AS\s+(?P<fmt>\w+)\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<part>[^)]*)\)\s*)?"
    r"(?:OPTIONS\s*\((?P<opts>.*)\)\s*)?$")

_PREPARE_RE = re.compile(
    r"(?is)^\s*PREPARE\s+(?P<name>\w+)\s*(?:\((?P<types>[^)]*)\))?\s+AS\s+(?P<body>.+)$")

_EXECUTE_RE = re.compile(
    r"(?is)^\s*EXECUTE\s+(?P<name>\w+)\s*(?:\((?P<args>.*)\))?\s*$")

_SET_RE = re.compile(r"(?is)^\s*SET\s+(?P<key>[\w.]+)\s*=\s*(?P<val>.+?)\s*$")

# datafusion.* config keys with a faithful Spark equivalent; everything else
# under the datafusion. prefix raises (silently ignoring a tuning knob would
# misrepresent what executed).
_CONF_MAP = {
    "datafusion.execution.target_partitions": "spark.sql.shuffle.partitions",
    "datafusion.execution.time_zone": "spark.sql.session.timeZone",
    "datafusion.execution.parquet.pushdown_filters": "spark.sql.parquet.filterPushdown",
    "datafusion.execution.parquet.enable_page_index": "spark.sql.parquet.filterPushdown",
    "datafusion.catalog.information_schema": None,   # always on in Spark
    "datafusion.execution.batch_size": None,         # Tungsten manages batches
}

_COPY_OPT_MAP = {"format.compression": "compression", "format.has_header": "header",
                 "compression": "compression", "has_header": "header"}


class SessionContext:
    """DataFusion-compatible session facade over Spark.

    >>> ctx = SessionContext()
    >>> ctx.register_parquet("lineitem", f"{sf_dir}/lineitem.parquet")
    >>> ctx.sql("SELECT strpos(l_returnflag, 'A') FROM lineitem").show()
    """

    def __init__(self, spark: SparkSession | None = None) -> None:
        if spark is None:
            from datafusion_spark import get_spark

            spark = get_spark("datafusion_compat")
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}
        self._prepared: dict[str, tuple[list[str], str]] = {}

    # -- registration ------------------------------------------------------

    def register_parquet(self, name: str, path: str) -> None:
        self.register_table(name, self.spark.read.parquet(path))

    def register_csv(self, name: str, path: str, **options) -> None:
        opts = {"header": "true", "inferSchema": "true"}
        opts.update({k: str(v) for k, v in options.items()})
        self.register_table(name, self.spark.read.options(**opts).csv(path))

    def register_json(self, name: str, path: str, **options) -> None:
        self.register_table(name, self.spark.read.options(**options).json(path))

    def register_avro(self, name: str, path: str) -> None:
        """Avro via the pure-Python container codec (sources/avro_lite.py) —
        the spark-avro jar isn't available offline."""
        from datafusion_spark.sources.avro_lite import read_avro_lite

        self.register_table(name, read_avro_lite(self.spark, path))

    def register_table(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        from datafusion_spark import catalog as _catalog

        if name in _catalog.TABLES:
            # A base-named view was replaced: the cached register_views()
            # state no longer describes the session.
            _catalog.invalidate_views(self.spark)

    def register_record_batches(self, name: str, batches) -> None:
        """Arrow RecordBatches (list or nested lists, as the reference
        bindings accept) → temp view, Arrow-converted once."""
        import pyarrow as pa

        flat = []
        for b in batches:
            flat.extend(b if isinstance(b, (list, tuple)) else [b])
        tbl = pa.Table.from_batches(flat)
        self.register_table(name, self.spark.createDataFrame(tbl.to_pandas()))

    def deregister_table(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._tables.pop(name, None)

    # -- reads -------------------------------------------------------------

    def read_parquet(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def read_csv(self, path: str, **options) -> DataFrame:
        opts = {"header": "true", "inferSchema": "true"}
        opts.update({k: str(v) for k, v in options.items()})
        return self.spark.read.options(**opts).csv(path)

    def read_json(self, path: str, **options) -> DataFrame:
        return self.spark.read.options(**options).json(path)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def table_exist(self, name: str) -> bool:
        return self.spark.catalog.tableExists(name)

    def tables(self) -> list[str]:
        return sorted(self._tables)

    # -- execution ---------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """Run DataFusion-dialect SQL (translated to Spark SQL, then planned
        by Catalyst — pushdown/pruning/codegen all apply).  COPY / PREPARE /
        EXECUTE / SET statements (reference: copy.slt, prepare.slt,
        set_variable.slt) are handled at the session level."""
        stmt = query.strip().rstrip(";").strip()
        head = stmt.split(None, 1)[0].lower() if stmt else ""
        if re.search(r"(?i)\binformation_schema\s*\.", stmt):
            self._register_information_schema()
            stmt = re.sub(r"(?i)\binformation_schema\s*\.", "information_schema_", stmt)
            return self.spark.sql(translate_sql(stmt))
        if head == "copy":
            return self._copy(stmt)
        if head == "prepare":
            return self._prepare(stmt)
        if head == "execute":
            return self._execute(stmt)
        if head == "set":
            mapped = self._map_set(stmt)
            if mapped is None:                       # recognized no-op knob
                return self.spark.range(0)
            return self.spark.sql(mapped)
        return self.spark.sql(translate_sql(query))

    # The reference spells both; keep both.
    def execute_sql(self, query: str) -> DataFrame:
        return self.sql(query)

    # -- statement handlers ------------------------------------------------

    def _copy(self, stmt: str) -> DataFrame:
        """COPY src TO 'path' [STORED AS fmt] [PARTITIONED BY (...)]
        [OPTIONS (...)] — executed as a distributed write (the 100 TB
        terminal operation); returns the reference's one-row count."""
        m = _COPY_RE.match(stmt)
        if m is None:
            raise DialectError("COPY: unrecognized syntax")
        src, fmt = m.group("src"), (m.group("fmt") or "parquet").lower()
        if fmt == "ndjson":
            fmt = "json"
        if fmt not in ("parquet", "csv", "json", "orc"):
            raise DialectError(f"COPY: unsupported format {fmt!r}")
        df = (self.sql(src[1:-1]) if src.startswith("(")
              else self.spark.table(src))
        writer = df.write.mode("overwrite").format(fmt)
        for k, v in self._copy_options(m.group("opts") or ""):
            writer = writer.option(k, v)
        if m.group("part"):
            cols = [c.strip().strip('"`') for c in m.group("part").split(",")]
            writer = writer.partitionBy(*cols)
        writer.save(m.group("path"))
        # row count read back from the written footers (metadata-only for
        # parquet/orc); matches the reference's COPY result row.
        n = self.spark.read.format(fmt).load(m.group("path")).count()
        return self.spark.createDataFrame([(n,)], "count bigint")

    @staticmethod
    def _copy_options(opts: str) -> list[tuple[str, str]]:
        out = []
        for m in re.finditer(r"'([^']+)'\s+'([^']*)'", opts):
            key = _COPY_OPT_MAP.get(m.group(1).lower())
            if key is None:
                raise DialectError(f"COPY: unsupported option {m.group(1)!r}")
            val = m.group(2)
            if key == "compression":
                val = re.sub(r"\(.*\)$", "", val)    # 'zstd(10)' -> 'zstd'
            out.append((key, val))
        return out

    def _prepare(self, stmt: str) -> DataFrame:
        m = _PREPARE_RE.match(stmt)
        if m is None:
            raise DialectError("PREPARE: expected PREPARE name(types) AS query")
        types = [t.strip() for t in (m.group("types") or "").split(",") if t.strip()]
        body = translate_sql(m.group("body"))
        used = {int(p) for p in re.findall(r"\$(\d+)", body)}
        if used and max(used) != len(types):
            raise DialectError(
                f"PREPARE specifies {len(types)} data types but query has"
                f" {max(used) if used else 0} parameters")
        self._prepared[m.group("name").lower()] = (types, body)
        return self.spark.range(0)

    def _execute(self, stmt: str) -> DataFrame:
        m = _EXECUTE_RE.match(stmt)
        if m is None:
            raise DialectError("EXECUTE: expected EXECUTE name(args)")
        name = m.group("name").lower()
        if name not in self._prepared:
            raise DialectError(f"EXECUTE: no prepared statement {name!r}")
        types, body = self._prepared[name]
        args = [a.strip() for a in (m.group("args") or "").split(",") if a.strip()]
        if len(args) != len(types):
            raise DialectError(
                f"EXECUTE {name}: expected {len(types)} arguments, got {len(args)}")
        # substitute highest-numbered first so $10 is not clobbered by $1;
        # each literal is cast to its declared type, exactly the reference's
        # placeholder coercion.
        for i in range(len(args), 0, -1):
            body = body.replace(f"${i}", f"CAST({args[i-1]} AS {types[i-1]})")
        return self.spark.sql(body)

    def _register_information_schema(self) -> None:
        """ISO information_schema views (reference information_schema.md:
        tables / columns / df_settings), synthesized from the Spark catalog.
        Registered as ``information_schema_<name>`` temp views; ``sql``
        rewrites the dotted reference (Spark has no information_schema)."""
        cat = self.spark.catalog
        tables = [
            ("spark_catalog", "public", t.name,
             "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "BASE TABLE")
            for t in cat.listTables()
        ]
        self.spark.createDataFrame(
            tables or [("spark_catalog", "public", "", "")],
            "table_catalog string, table_schema string, table_name string,"
            " table_type string",
        ).filter("table_name <> ''").createOrReplaceTempView("information_schema_tables")
        cols = []
        for t in cat.listTables():
            for c in cat.listColumns(t.name):
                cols.append(("spark_catalog", "public", t.name, c.name,
                             c.dataType, "YES" if c.nullable else "NO"))
        self.spark.createDataFrame(
            cols or [("spark_catalog", "public", "", "", "", "")],
            "table_catalog string, table_schema string, table_name string,"
            " column_name string, data_type string, is_nullable string",
        ).filter("table_name <> ''").createOrReplaceTempView("information_schema_columns")
        keys = ["spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled",
                "spark.sql.session.timeZone", "spark.sql.parquet.filterPushdown",
                "spark.sql.autoBroadcastJoinThreshold"]
        settings = []
        for k in keys:
            try:
                settings.append((k, self.spark.conf.get(k)))
            except Exception:  # noqa: BLE001 — unset knob
                continue
        self.spark.createDataFrame(
            settings, "name string, value string"
        ).createOrReplaceTempView("information_schema_df_settings")

    def _map_set(self, stmt: str):
        m = _SET_RE.match(stmt)
        if m is None:
            return stmt                              # SHOW-style SET, pass through
        key = m.group("key")
        if key.lower().startswith("datafusion."):
            if key.lower() not in _CONF_MAP:
                raise DialectError(f"SET: no Spark mapping for {key!r}")
            mapped = _CONF_MAP[key.lower()]
            if mapped is None:
                return None
            return f"SET {mapped} = {m.group('val')}"
        return stmt

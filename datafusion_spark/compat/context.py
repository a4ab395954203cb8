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

from pyspark.sql import DataFrame, SparkSession

from datafusion_spark.compat.dialect import translate_sql


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

    # -- registration ------------------------------------------------------

    def register_parquet(self, name: str, path: str) -> None:
        self.register_table(name, self.spark.read.parquet(path))

    def register_csv(self, name: str, path: str, **options) -> None:
        opts = {"header": "true", "inferSchema": "true"}
        opts.update({k: str(v) for k, v in options.items()})
        self.register_table(name, self.spark.read.options(**opts).csv(path))

    def register_json(self, name: str, path: str, **options) -> None:
        self.register_table(name, self.spark.read.options(**options).json(path))

    def register_table(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self._tables[name] = df

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
        by Catalyst — pushdown/pruning/codegen all apply)."""
        return self.spark.sql(translate_sql(query))

    # The reference spells both; keep both.
    def execute_sql(self, query: str) -> DataFrame:
        return self.sql(query)

"""DataFusion compatibility surface.

Two pieces let a reference user run their existing workload unmodified:

  * :mod:`datafusion_spark.compat.dialect` — translates DataFusion-dialect
    SQL (function names, arg orders, chrono formats, arrow types) into
    Spark SQL.  Pure source-to-source: the output is planned by Catalyst,
    so every translated query gets pushdown/codegen/AQE for free.
  * :mod:`datafusion_spark.compat.context` — a ``SessionContext`` with the
    reference's session API (``sql`` / ``register_parquet`` / ``table`` /
    ``read_parquet`` …) backed by a ``SparkSession``.

Reference surface inventoried from the public docs:
docs/source/user-guide/sql/{scalar_functions,aggregate_functions,
window_functions}.md (270 scalar + 46 aggregate + 11 window names).
"""

from datafusion_spark.compat.context import SessionContext
from datafusion_spark.compat.dataframe_ext import install_dataframe_compat
from datafusion_spark.compat.dialect import translate_sql

install_dataframe_compat()

__all__ = ["SessionContext", "translate_sql", "install_dataframe_compat"]

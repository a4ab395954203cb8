"""datafusion_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/datafusion (an Arrow-native OLAP
engine; see /root/reference).

Design: declare logical plans with the Spark DataFrame / SQL API and let
Catalyst + Tungsten choose physical strategy (hash agg, broadcast / shuffle
joins, whole-stage codegen).  Python stays on the driver describing plans;
execution is JVM-side.  Pandas UDFs (Arrow-batched) are used only where
built-in expressions genuinely cannot express the semantics (e.g. multimodal
decode stubs).

Layout:
  session.py    — tuned SparkSession factory (AQE, UTC, Arrow, pushdown)
  catalog.py    — table registry over the driver-generated parquet data
  queries/      — the operator/query inventory (SURVEY.md §2), each entry
                  registered with a DuckDB oracle for the correctness gate
  operators/    — reusable distributed operators (top-k, as-of join, dedup)
  pipeline/     — LLM-training-data ops (dedup, similarity, text, multimodal)
  streaming/    — Structured Streaming counterparts of the batch operators
  plans/        — explain/plan-audit helpers (pushdown + codegen assertions)
"""

from datafusion_spark.session import get_spark
from datafusion_spark.catalog import load_tables, register_views, TABLES

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.1.0"

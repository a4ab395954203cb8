"""Multimodal decode pipeline entries (rows-only driver check: the decode
stub is Python-side, not SQL-expressible — see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.operators.multimodal import decode_media, media_table_from_documents
from datafusion_spark.queries.registry import query


@query("multimodal_decode_features", oracle=None, tags=("pipeline", "multimodal"))
def multimodal_decode_features(spark, sf_dir):
    """Binary payload → decoded metadata/features via Arrow-batched
    mapInPandas (decode stubbed deterministically; plumbing real)."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_table_from_documents(docs)
    return decode_media(media)


@query(
    "multimodal_metadata_agg",
    oracle=None,
    tags=("pipeline", "multimodal"),
)
def multimodal_metadata_agg(spark, sf_dir):
    """Post-decode relational analytics: the decoded features join back
    into ordinary DataFrame aggregation — media type profile with byte and
    dimension stats."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(media_table_from_documents(docs))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("feature_norm"), 6).alias("avg_feature_norm"),
        )
        .orderBy("media_type")
    )

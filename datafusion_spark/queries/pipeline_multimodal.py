"""Multimodal decode pipeline entries.

Image rows are REAL: the media table synthesizes PNG payloads with the
vendored stdlib codec and the pipeline decodes them back (width/height/
channels/mean from actual pixels, known-answer tested).  Audio/video
decode remains a deterministic stub (no codec in this container).

Correctness: the decode is Python-side, not SQL-expressible — but the
payloads are deterministic pure functions of ``documents``, so every
feature has a closed-form expected value.  tools/gen_multimodal_expected.py
computes them from first principles (pixel/sample construction math, NOT
the decode path under test) into multimodal_expected.json, and each entry
registers that as a VALUES-table oracle (sf-pinned to the driver's sf0.01,
the same pattern as the sha1/crc32 VALUES-map oracle in
functions_spark_compat.py).  Missing fixture → rows-only, as before."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.operators.multimodal import decode_media, media_table_from_documents
from datafusion_spark.queries.registry import query


def _load_expected():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "multimodal_expected.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


_EXPECTED = _load_expected()


def _sql_literal(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "DOUBLE":
        # E-notation parses as DOUBLE directly (a bare decimal literal is
        # DECIMAL in DuckDB, and DECIMAL->DOUBLE can lose the last bit);
        # 17 significant digits round-trip any double bit-exactly.
        return f"CAST({float(v):.17e} AS DOUBLE)"
    return f"CAST({v} AS {typ})"


def _values_oracle(name: str):
    """(oracle_sql, extra_tags) for one entry from the fixture, or
    (None, ()) when the fixture is absent."""
    if not _EXPECTED or name not in _EXPECTED.get("entries", {}):
        return None, ()
    spec = _EXPECTED["entries"][name]
    cols, types = spec["columns"], spec["types"]
    rows = ",\n".join(
        "(" + ", ".join(_sql_literal(v, t) for v, t in zip(row, types)) + ")"
        for row in spec["rows"]
    )
    sql = (
        "SELECT "
        + ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
        + f" FROM (VALUES {rows}) AS t({', '.join(cols)})"
    )
    return sql, (f"sf-pinned:{_EXPECTED['sf_dir']}",)


def _mm_query(name: str):
    oracle, extra = _values_oracle(name)
    return query(name, oracle=oracle, tags=("pipeline", "multimodal") + extra)


@_mm_query("multimodal_decode_features")
def multimodal_decode_features(spark, sf_dir):
    """Binary payload → decoded metadata/features via Arrow-batched
    mapInPandas.  PNG rows decode for real (vendored stdlib codec);
    audio/video rows use the deterministic stub fallback."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_table_from_documents(docs)
    return decode_media(media)


@_mm_query("multimodal_metadata_agg")
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


@_mm_query("multimodal_frame_sample")
def multimodal_frame_sample(spark, sf_dir):
    """Video-shaped fan-out: each 'video/mp4' payload yields 4 sampled
    frame rows (stubbed decode; see operators/multimodal.py
    sample_frames), then per-video frame statistics."""
    from datafusion_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = media_table_from_documents(docs).filter(F.col("media_type") == "video/mp4")
    frames = sample_frames(media, n_frames=4)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.round(F.avg("frame_mean"), 6).alias("avg_frame_mean"),
            F.min("frame_digest").alias("first_digest_sorted"),
        )
        .orderBy("doc_id")
    )

@_mm_query("multimodal_audio_features")
def multimodal_audio_features(spark, sf_dir):
    """Audio-shaped pipeline: 'audio/wav' payloads → windowed RMS /
    zero-crossing features (operators/multimodal.py extract_audio_windows,
    REAL stdlib-wave PCM decode) → per-doc loudness profile.  Oracle: the
    first-principles VALUES fixture (module docstring)."""
    from datafusion_spark.operators.multimodal import (
        extract_audio_windows,
        media_table_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = media_table_from_documents(docs).filter(
        F.col("media_type") == "audio/wav"
    )
    feats = extract_audio_windows(media)
    return feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.round(F.max("rms"), 6).alias("peak_rms"),
        F.sum("zero_crossings").cast("long").alias("total_zero_crossings"),
    )


@_mm_query("multimodal_image_resize")
def multimodal_image_resize(spark, sf_dir):
    """Vision-preprocess pipeline: 'image/png' payloads → strided resize
    to 32×32 + normalize → per-image stats and quadrant means
    (operators/multimodal.py resize_normalize_images, REAL PNG decode).
    Oracle: the first-principles VALUES fixture (module docstring)."""
    from datafusion_spark.operators.multimodal import (
        media_table_from_documents,
        resize_normalize_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = media_table_from_documents(docs).filter(
        F.col("media_type") == "image/png"
    )
    feats = resize_normalize_images(media)
    return feats.select(
        "doc_id", "src_w", "src_h",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        F.round("std_pixel", 6).alias("std_pixel"),
        F.round(F.element_at("quadrant_means", 1), 6).alias("q_tl"),
        F.round(F.element_at("quadrant_means", 4), 6).alias("q_br"),
    )

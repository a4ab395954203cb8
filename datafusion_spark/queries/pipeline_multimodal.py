"""Multimodal decode pipeline entries (rows-only driver check: the decode
is Python-side, not SQL-expressible — see operators/multimodal.py).

Image rows are REAL: the media table synthesizes PNG payloads with the
vendored stdlib codec and the pipeline decodes them back (width/height/
channels/mean from actual pixels, known-answer tested).  Audio/video
decode remains a deterministic stub (no codec in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.operators.multimodal import decode_media, media_table_from_documents
from datafusion_spark.queries.registry import query


@query("multimodal_decode_features", oracle=None, tags=("pipeline", "multimodal"))
def multimodal_decode_features(spark, sf_dir):
    """Binary payload → decoded metadata/features via Arrow-batched
    mapInPandas.  PNG rows decode for real (vendored stdlib codec);
    audio/video rows use the deterministic stub fallback."""
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


@query("multimodal_frame_sample", oracle=None, tags=("pipeline", "multimodal"))
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

@query("multimodal_audio_features", oracle=None, tags=("pipeline", "multimodal"))
def multimodal_audio_features(spark, sf_dir):
    """Audio-shaped pipeline: 'audio/wav' payloads → windowed RMS /
    zero-crossing features (operators/multimodal.py extract_audio_windows,
    stubbed PCM decode) → per-doc loudness profile.  [no-oracle]: the stub
    decode has no SQL equivalent; the driver's rows-only check pins the
    schema and determinism."""
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


@query("multimodal_image_resize", oracle=None, tags=("pipeline", "multimodal"))
def multimodal_image_resize(spark, sf_dir):
    """Vision-preprocess pipeline: 'image/png' payloads → strided resize
    to 32×32 + normalize → per-image stats and quadrant means
    (operators/multimodal.py resize_normalize_images, stubbed decode).
    [no-oracle]: rows-only check pins schema + determinism."""
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

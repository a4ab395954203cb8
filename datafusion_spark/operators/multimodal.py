"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched pandas over mapInPandas.

The decode step is a clearly-marked STUB: real image/audio libraries are
not available in this container, so `_decode_payload` falls back to a
deterministic fake (bytes-derived dimensions/features) behind an
import-try.  Everything Spark-side — the binary schema, the batch
iterator shape, partition sizing, and the output contract — is real and
tested; swapping the stub for PIL/torchvision changes no plumbing.

Scale notes: media payloads dominate row size, so batches are bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` (bytes, not rows, are the
real budget — set it low for video).  The decode is a narrow map: no
shuffle, and each partition streams its batches through pandas without
materializing the partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, n_channels int, feature_norm double, sha1_prefix string"
)


def _decode_payload(payload: bytes) -> tuple[int, int, int, float]:
    """STUB decode. Tries a real image decoder; falls back to deterministic
    bytes-derived fake dimensions + feature norm."""
    try:  # pragma: no cover - decoder not present in this container
        from PIL import Image  # noqa: F401
        import io

        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        return w, h, len(img.getbands()), float(sum(img.histogram()[:8]))
    except Exception:
        digest = hashlib.sha1(payload).digest()
        width = 64 + digest[0] % 192
        height = 64 + digest[1] % 192
        channels = 1 + digest[2] % 3
        feature_norm = sum(digest[:8]) / (8 * 255.0)
        return width, height, channels, feature_norm


def decode_media(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Decode a binary media column into typed metadata + features.

    Input schema: (id_col long, media_type string, payload binary).
    Runs as mapInPandas so each Arrow batch is decoded vectorized-Python
    side without a shuffle.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "feature_norm": [d[3] for d in decoded],
                    "sha1_prefix": [
                        hashlib.sha1(bytes(p)).hexdigest()[:12] for p in pdf[payload_col]
                    ],
                }
            )
            yield out

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Model the documents table as a media table: text bytes stand in for
    an encoded payload (binary column + typed metadata)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched pandas over mapInPandas.

Decode resolution order: PIL if installed → the vendored pure-stdlib PNG
codec (png_lite.py — REAL decode, known-answer tested against generated
payloads) → the stdlib ``wave`` module for RIFF/WAVE payloads (REAL
16-bit PCM decode, known-answer tested) → a deterministic bytes-derived
fake as the last-resort fallback (video only; no mp4 codec ships in this
container, that path remains a clearly-marked stub).  Everything
Spark-side — the binary schema, the batch iterator shape, partition
sizing, and the output contract — is identical across all paths.

Scale notes: media payloads dominate row size, so batches are bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` (bytes, not rows, are the
real budget — set it low for video).  The decode is a narrow map: no
shuffle, and each partition streams its batches through pandas without
materializing the partition.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Repo root, captured BY VALUE into every worker-executed closure below:
# a Python worker only inherits PYTHONPATH, not the driver's sys.path, so a
# driver launched from another cwd (the harness may import this repo by
# absolute path) would otherwise hit ModuleNotFoundError the moment a
# pickled-by-value nested function tries to resolve this module's helpers.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, n_channels int, feature_norm double, sha1_prefix string"
)


def _decode_payload(payload: bytes) -> tuple[int, int, int, float]:
    """Decode image metadata + a scalar feature: PIL if present, else the
    vendored pure-stdlib PNG codec for real PNG payloads, else (non-image
    bytes) a deterministic bytes-derived fake (the stub fallback)."""
    try:  # pragma: no cover - decoder not present in this container
        from PIL import Image  # noqa: F401
        import io

        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        return w, h, len(img.getbands()), float(sum(img.histogram()[:8]))
    except Exception:
        pass
    try:
        from datafusion_spark.operators.png_lite import decode_png

        w, h, channels, pixels = decode_png(payload)
        # mean sample value in [0,1]: a real, pixel-derived feature
        return w, h, channels, sum(pixels) / (len(pixels) * 255.0)
    except ValueError:
        pass
    samples = _decode_wav(payload)
    if samples is not None:
        # audio "image": width = frame count, height = 1; feature = mean
        # absolute amplitude in [0,1] — a real, sample-derived value
        n = len(samples) or 1
        return len(samples), 1, 1, float(sum(abs(s) for s in samples) / n)
    digest = hashlib.sha1(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    feature_norm = sum(digest[:8]) / (8 * 255.0)
    return width, height, channels, feature_norm


def _decode_wav(payload: bytes):
    """REAL WAV decode via the stdlib ``wave`` module: returns float64
    samples in [-1, 1] for 16-bit PCM RIFF/WAVE payloads, else None."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as w:
            raw = w.readframes(w.getnframes())
            width = w.getsampwidth()
            nch = w.getnchannels()
        if width == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:  # 8-bit WAV is unsigned
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            return None
        if nch > 1:
            # interleaved multi-channel: downmix to mono so frame count and
            # RMS/amplitude features are per-frame, not per-sample (a stereo
            # file would otherwise report 2x frames and mix channels)
            samples = samples[: (len(samples) // nch) * nch]
            samples = samples.reshape(-1, nch).mean(axis=1)
        return samples
    except Exception:
        return None


def decode_media(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Decode a binary media column into typed metadata + features.

    Input schema: (id_col long, media_type string, payload binary).
    Runs as mapInPandas so each Arrow batch is decoded vectorized-Python
    side without a shuffle.
    """

    root = _PKG_ROOT

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        from datafusion_spark.operators.multimodal import _decode_payload

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


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms long, frame_digest string, frame_mean double"
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling for video payloads: one input row → ``n_frames``
    output rows (uniform temporal stride).  STUB decode: without a real
    video codec the 'frame' is a deterministic byte-slice digest; the
    Spark contract — mapInPandas fan-out, bounded batches, stable output
    schema — is the real deliverable and survives a codec swap.

    Scale: fan-out is row-local (no shuffle); output rows are small
    (digests, not pixels), so a downstream repartition is only needed if
    frames feed a heavy per-frame model.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, digs, means = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(p)
                span = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    chunk = data[i * span : (i + 1) * span] or b"\x00"
                    ids.append(int(doc_id))
                    idxs.append(i)
                    tss.append(i * 1000)  # fake 1 fps timeline
                    digs.append(hashlib.sha1(chunk).hexdigest()[:12])
                    means.append(sum(chunk) / (len(chunk) * 255.0))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_digest": digs,
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return df.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Model the documents table as a media table.  Image rows carry REAL
    PNG payloads (text bytes tiled into a text-length-sized pixel grid and
    encoded with the vendored stdlib codec) and audio rows carry REAL
    16-bit PCM WAV containers (samples derived deterministically from the
    text bytes, written with the stdlib ``wave`` module), so both decode
    paths downstream are exercised for real; video rows keep raw text
    bytes (no mp4 codec ships in this container — that decoder remains a
    stub)."""
    from pyspark.sql.functions import pandas_udf

    root = _PKG_ROOT

    @pandas_udf("binary")
    def png_payload(text: pd.Series) -> pd.Series:
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        from datafusion_spark.operators.png_lite import encode_png

        out = []
        for t in text:
            data = (t or " ").encode("utf-8")
            w = 16 + len(data) % 32
            h = 16 + (len(data) * 7) % 32
            pixels = bytes(data[i % len(data)] for i in range(w * h))
            out.append(encode_png(pixels, w, h, 1))
        return pd.Series(out)

    @pandas_udf("binary")
    def wav_payload(text: pd.Series) -> pd.Series:
        import io
        import wave

        import numpy as np

        out = []
        for t in text:
            data = (t or " ").encode("utf-8")
            n = 256 + (len(data) * 13) % 512
            # deterministic int16 samples from cycled text bytes: centered,
            # scaled to a broad amplitude so RMS/zero-crossings are nontrivial
            b = np.frombuffer(data, dtype=np.uint8)
            idx = np.arange(n) % len(b)
            samples = ((b[idx].astype(np.int32) - 128) * 200).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(samples.tobytes())
            out.append(buf.getvalue())
        return pd.Series(out)

    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.when(F.col("doc_id") % 3 == 0, png_payload(F.col("text")))
        .when(F.col("doc_id") % 3 == 1, wav_payload(F.col("text")))
        .otherwise(F.col("text").cast("binary"))
        .alias("payload"),
    )

AUDIO_SCHEMA = (
    "doc_id long, window_idx int, n_samples int, rms double, zero_crossings int"
)


def extract_audio_windows(
    df: DataFrame,
    n_windows: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Windowed audio features for audio payloads: one input row →
    ``n_windows`` rows of (RMS energy, zero-crossing count).  Decode
    order: soundfile if installed → stdlib ``wave`` for RIFF/WAVE (REAL
    16-bit PCM decode, known-answer tested) → signed-8-bit-PCM
    interpretation of raw bytes as the deterministic last resort.

    Scale: row-local fan-out (no shuffle); feature rows are ~40 bytes, so
    the output is negligible next to the payload scan.  Batches are
    Arrow-bounded — payload bytes stream through pandas one batch at a
    time, never a whole partition.
    """
    import numpy as np

    root = _PKG_ROOT

    def audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        from datafusion_spark.operators.multimodal import _decode_wav

        for pdf in batches:
            ids, idxs, ns, rmss, zcs = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(p)
                samples = None
                try:  # pragma: no cover - codec not present in container
                    import soundfile as sf  # noqa: F401
                    import io

                    samples, _rate = sf.read(io.BytesIO(data))
                except Exception:
                    samples = _decode_wav(data)
                if samples is None:
                    samples = (
                        np.frombuffer(data or b"\x00", dtype=np.int8).astype(
                            np.float64
                        )
                        / 128.0
                    )
                span = max(len(samples) // n_windows, 1)
                for i in range(n_windows):
                    seg = samples[i * span : (i + 1) * span]
                    if len(seg) == 0:
                        seg = np.zeros(1)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    ns.append(len(seg))
                    rmss.append(float(np.sqrt(np.mean(seg * seg))))
                    zcs.append(int(np.count_nonzero(np.diff(np.signbit(seg)))))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "zero_crossings": pd.Series(zcs, dtype="int32"),
                }
            )

    return df.mapInPandas(audio_batches, schema=AUDIO_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, out_w int, out_h int, "
    "mean_pixel double, std_pixel double, quadrant_means array<double>"
)


def resize_normalize_images(
    df: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize + normalize for vision-training preprocess: decode →
    strided-subsample to (out_h, out_w) → per-image mean/std + quadrant
    means (the stand-in for a patch-embedding stub).  STUB decode: the
    payload bytes become a deterministic fake grayscale image (sha1-seeded
    dimensions, bytes tiled into the pixel grid); a real decoder (PIL)
    slots in behind the same try-import without touching the contract.

    Scale: pixels never leave the task — output rows carry ~10 doubles
    each regardless of image size, so a 100 TB image corpus reduces to a
    GB-scale feature table in one narrow map.  Batch memory is bounded by
    Arrow's maxRecordsPerBatch (set by bytes, not rows, for media).
    """
    import numpy as np

    root = _PKG_ROOT

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        from datafusion_spark.operators.multimodal import _decode_payload

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "src_w", "src_h", "out_w", "out_h",
                "mean_pixel", "std_pixel", "quadrant_means")}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(p)
                w, h, _, _ = _decode_payload(data)
                px = None
                try:  # pragma: no cover - decoder not present in container
                    from PIL import Image
                    import io

                    img = Image.open(io.BytesIO(data)).convert("L")
                    px = np.asarray(img, dtype=np.float64) / 255.0
                    h, w = px.shape
                except Exception:
                    pass
                if px is None:
                    try:
                        from datafusion_spark.operators.png_lite import decode_png

                        w, h, nch, pixels = decode_png(data)
                        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, nch)
                        # luma: mean over channels (real decoded pixels)
                        px = arr.mean(axis=2) / 255.0
                    except ValueError:  # non-PNG payload: stub fallback
                        buf = np.frombuffer(data or b"\x00", dtype=np.uint8)
                        px = np.resize(buf, (h, w)).astype(np.float64) / 255.0
                ys = np.linspace(0, h - 1, out_h).astype(int)
                xs = np.linspace(0, w - 1, out_w).astype(int)
                small = px[np.ix_(ys, xs)]
                hh, hw = out_h // 2, out_w // 2
                quads = [
                    float(small[:hh, :hw].mean()),
                    float(small[:hh, hw:].mean()),
                    float(small[hh:, :hw].mean()),
                    float(small[hh:, hw:].mean()),
                ]
                out["doc_id"].append(int(doc_id))
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["mean_pixel"].append(float(small.mean()))
                out["std_pixel"].append(float(small.std()))
                out["quadrant_means"].append(quads)
            yield pd.DataFrame(out)

    return df.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)

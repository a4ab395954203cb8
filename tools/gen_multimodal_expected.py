"""Generate the known-answer fixture for the 5 multimodal entries.

The media payloads are deterministic pure functions of ``documents``
(operators/multimodal.py media_table_from_documents), so every feature the
pipeline emits has a closed-form expected value computable OUTSIDE Spark.
This tool computes those values from FIRST PRINCIPLES — the pixel grid /
PCM samples are reconstructed from the text bytes by their construction
formula, never by running the decode path under test — and writes them to
``datafusion_spark/queries/multimodal_expected.json``.  The query module
turns that fixture into VALUES-table oracles (sf-pinned), upgrading the 5
entries from rows-only to full value-hash checks, mirroring the sha1/crc32
VALUES-map oracle pattern in functions_spark_compat.py.

Container-level fields (n_bytes, sha1 of the encoded file) necessarily go
through the same encoders the pipeline uses (png_lite / stdlib wave) —
they pin byte-level determinism; the feature math is the independent part.

Usage: python tools/gen_multimodal_expected.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import sys
import wave
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spark_round(x: float, scale: int) -> float:
    """Replicate Spark's round(double, d): BigDecimal.valueOf (shortest
    decimal repr, same as Python repr) + HALF_UP at ``scale``."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def png_bytes(data: bytes) -> tuple[bytes, int, int]:
    from datafusion_spark.operators.png_lite import encode_png

    w = 16 + len(data) % 32
    h = 16 + (len(data) * 7) % 32
    pixels = bytes(data[i % len(data)] for i in range(w * h))
    return encode_png(pixels, w, h, 1), w, h


def wav_bytes(data: bytes) -> tuple[bytes, np.ndarray]:
    n = 256 + (len(data) * 13) % 512
    b = np.frombuffer(data, dtype=np.uint8)
    idx = np.arange(n) % len(b)
    samples = ((b[idx].astype(np.int32) - 128) * 200).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), samples.astype(np.float64) / 32768.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    tbl = pq.read_table(os.path.join(args.sf, "documents.parquet"),
                        columns=["doc_id", "text"])
    docs = tbl.to_pylist()

    decode_rows = []       # multimodal_decode_features
    frame_rows = []        # multimodal_frame_sample (per-doc agg)
    audio_rows = []        # multimodal_audio_features (per-doc agg)
    resize_rows = []       # multimodal_image_resize

    for rec in sorted(docs, key=lambda r: r["doc_id"]):
        doc_id = int(rec["doc_id"])
        data = (rec["text"] or " ").encode("utf-8")
        kind = doc_id % 3

        if kind == 0:  # image/png
            payload, w, h = png_bytes(data)
            # first-principles pixel grid: data bytes cycled into w*h cells
            px = np.array([data[i % len(data)] for i in range(w * h)],
                          dtype=np.uint8)
            # decode feature: mean sample value in [0,1] (exact int sum)
            feature = int(px.sum()) / (len(px) * 255.0)
            decode_rows.append([doc_id, "image/png", len(payload),
                                w, h, 1, feature,
                                hashlib.sha1(payload).hexdigest()[:12]])
            # resize entry: luma grid /255, strided 32x32 subsample
            grid = px.reshape(h, w).astype(np.float64) / 255.0
            ys = np.linspace(0, h - 1, 32).astype(int)
            xs = np.linspace(0, w - 1, 32).astype(int)
            small = grid[np.ix_(ys, xs)]
            resize_rows.append([
                doc_id, w, h,
                spark_round(float(small.mean()), 6),
                spark_round(float(small.std()), 6),
                spark_round(float(small[:16, :16].mean()), 6),
                spark_round(float(small[16:, 16:].mean()), 6),
            ])
        elif kind == 1:  # audio/wav
            payload, samples = wav_bytes(data)
            n = len(samples)
            # decode feature: mean |amplitude| via sequential Python sum
            # (matches _decode_payload's `sum(abs(s) for s in samples)`)
            feature = float(sum(abs(s) for s in samples) / n)
            decode_rows.append([doc_id, "audio/wav", len(payload),
                                n, 1, 1, feature,
                                hashlib.sha1(payload).hexdigest()[:12]])
            # audio windows: 4 windows of span n//4 (tail dropped)
            span = max(n // 4, 1)
            rmss, zcs = [], []
            for i in range(4):
                seg = samples[i * span:(i + 1) * span]
                if len(seg) == 0:
                    seg = np.zeros(1)
                rmss.append(float(np.sqrt(np.mean(seg * seg))))
                zcs.append(int(np.count_nonzero(np.diff(np.signbit(seg)))))
            audio_rows.append([doc_id, 4, spark_round(max(rmss), 6),
                               int(sum(zcs))])
        else:  # video/mp4 (stub path)
            payload = data
            digest = hashlib.sha1(payload).digest()
            decode_rows.append([
                doc_id, "video/mp4", len(payload),
                64 + digest[0] % 192, 64 + digest[1] % 192,
                1 + digest[2] % 3, sum(digest[:8]) / (8 * 255.0),
                hashlib.sha1(payload).hexdigest()[:12]])
            # frame sample: 4 uniform byte-slices, sha1 digests + means
            span = max(len(payload) // 4, 1)
            digs, means = [], []
            for i in range(4):
                chunk = payload[i * span:(i + 1) * span] or b"\x00"
                digs.append(hashlib.sha1(chunk).hexdigest()[:12])
                means.append(sum(chunk) / (len(chunk) * 255.0))
            # sequential sum matches Spark's avg accumulator order exactly
            frame_rows.append([doc_id, 4,
                               spark_round(sum(means) / 4.0, 6),
                               min(digs)])

    # metadata_agg: groupBy media_type over the decode rows.  avg of
    # doubles matches Spark's distributed sum to well inside the 6-dp
    # rounding (values are O(0.1-1), ~170 terms -> ~1e-14 abs error).
    agg_rows = []
    for mt in ("audio/wav", "image/png", "video/mp4"):
        sel = [r for r in decode_rows if r[1] == mt]
        agg_rows.append([
            mt, len(sel), int(sum(r[2] for r in sel)),
            spark_round(sum(r[3] for r in sel) / len(sel), 4),
            spark_round(sum(r[6] for r in sel) / len(sel), 6),
        ])

    out = {
        "sf_dir": args.sf,
        "entries": {
            "multimodal_decode_features": {
                "columns": ["doc_id", "media_type", "n_bytes", "width",
                            "height", "n_channels", "feature_norm",
                            "sha1_prefix"],
                "types": ["BIGINT", "VARCHAR", "BIGINT", "INTEGER",
                          "INTEGER", "INTEGER", "DOUBLE", "VARCHAR"],
                "rows": decode_rows,
            },
            "multimodal_metadata_agg": {
                "columns": ["media_type", "n_items", "total_bytes",
                            "avg_width", "avg_feature_norm"],
                "types": ["VARCHAR", "BIGINT", "BIGINT", "DOUBLE", "DOUBLE"],
                "rows": agg_rows,
            },
            "multimodal_frame_sample": {
                "columns": ["doc_id", "n_frames", "avg_frame_mean",
                            "first_digest_sorted"],
                "types": ["BIGINT", "BIGINT", "DOUBLE", "VARCHAR"],
                "rows": frame_rows,
            },
            "multimodal_audio_features": {
                "columns": ["doc_id", "n_windows", "peak_rms",
                            "total_zero_crossings"],
                "types": ["BIGINT", "BIGINT", "DOUBLE", "BIGINT"],
                "rows": audio_rows,
            },
            "multimodal_image_resize": {
                "columns": ["doc_id", "src_w", "src_h", "mean_pixel",
                            "std_pixel", "q_tl", "q_br"],
                "types": ["BIGINT", "INTEGER", "INTEGER", "DOUBLE",
                          "DOUBLE", "DOUBLE", "DOUBLE"],
                "rows": resize_rows,
            },
        },
    }
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datafusion_spark", "queries",
        "multimodal_expected.json")
    with open(dest, "w") as f:
        json.dump(out, f)
    sizes = {k: len(v["rows"]) for k, v in out["entries"].items()}
    print(f"wrote {dest}: {sizes}")


if __name__ == "__main__":
    main()

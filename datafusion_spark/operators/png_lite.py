"""Pure-stdlib PNG codec (zlib + struct): the real decode path behind the
multimodal operators.

The container has no PIL/libpng, so `_decode_payload` previously always fell
back to a bytes-derived fake.  PNG's baseline format needs nothing beyond
the stdlib: chunks are length/type/data/crc32 records, IHDR is a fixed
struct, IDAT is zlib-compressed scanlines with a 1-byte filter prefix per
row (filters 0-4: None/Sub/Up/Average/Paeth).  This module implements

  * ``decode_png(data) -> (width, height, channels, pixels)`` for 8-bit
    greyscale / grey+alpha / RGB / RGBA, non-interlaced — exactly the
    subset the encoder below produces and the overwhelmingly common case
    for training corpora;
  * ``encode_png(pixels, width, height, channels)`` writing filter-0 rows,
    used by the test fixtures to generate REAL payloads with known
    dimensions and by deterministic media synthesis.

Reference parity note: the reference engine treats media as opaque binary
columns too (no image kernels in datafusion/functions); this decoder is
part of the training-pipeline surface layered on top (SURVEY §2.8).

Scale: decode runs inside mapInPandas tasks — pure-Python unfiltering is
~10 MB/s/core which is fine for metadata/feature extraction at test scale;
a production cluster swaps in PIL via the same `_decode_payload` try-chain
without touching any Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"

# colortype -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG: returns (width, height, channels, pixels)
    with pixels row-major, channel-interleaved, 8 bits per sample.

    Raises ValueError on non-PNG input or unsupported variants (16-bit,
    palette, interlaced) — callers fall back to the stub for those.
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, colortype, comp, filt, interlace = ihdr
    if depth != 8 or colortype not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={colortype} "
            f"interlace={interlace})"
        )
    channels = _CHANNELS[colortype]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Encode 8-bit pixels (row-major, channel-interleaved) as a baseline
    non-interlaced PNG with filter-0 scanlines."""
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {stride * height}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )

"""Unit tests for the stdlib PNG codec (operators/png_stdlib.py).

The decoder's unfiltering is verified against an independently
implemented FILTERING side built here in the tests (the spec's forward
direction), so the two directions check each other rather than sharing
code. No Spark session needed — the codec is pure Python.
"""

from __future__ import annotations

import os
import struct
import zlib

import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.png_stdlib import (
    decode_png,
    encode_png,
    resize_nearest,
)

TINY = open(os.path.join(os.path.dirname(__file__), "data", "tiny.png"), "rb").read()


def test_decode_checked_in_png_dimensions():
    w, h, ch, rows = decode_png(TINY)
    assert (w, h, ch) == (6, 4, 3)
    assert len(rows) == 4 and all(len(r) == 6 * 3 for r in rows)


def test_encode_decode_round_trip_exact():
    """decode → encode → decode reproduces the exact same pixels."""
    w, h, ch, rows = decode_png(TINY)
    again_w, again_h, again_ch, again_rows = decode_png(encode_png(rows, w, h, ch))
    assert (again_w, again_h, again_ch) == (w, h, ch)
    assert [bytes(r) for r in again_rows] == [bytes(r) for r in rows]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, line: bytes, prior: bytes, bpp: int) -> bytes:
    """Forward filtering per PNG spec §9 — the inverse of what the
    decoder implements, written independently here."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = line[i]
        elif ftype == 1:
            out[i] = (line[i] - a) & 0xFF
        elif ftype == 2:
            out[i] = (line[i] - b) & 0xFF
        elif ftype == 3:
            out[i] = (line[i] - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            out[i] = (line[i] - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _build_png(pixels: list[bytes], width: int, height: int,
               channels: int, filters: list[int]) -> bytes:
    """Hand-assemble a PNG applying a CHOSEN filter type per row."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    prior = bytes(width * channels)
    raw = b""
    for y in range(height):
        raw += bytes([filters[y]]) + _filter_row(filters[y], pixels[y], prior, channels)
        prior = pixels[y]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_all_filter_types_reconstruct(channels):
    """An image whose five rows use filters 0..4 decodes back to the
    original pixels for every supported color type."""
    import random

    rng = random.Random(42 + channels)
    width, height = 7, 5
    pixels = [
        bytes(rng.randrange(256) for _ in range(width * channels))
        for _ in range(height)
    ]
    png = _build_png(pixels, width, height, channels, filters=[0, 1, 2, 3, 4])
    w, h, ch, rows = decode_png(png)
    assert (w, h, ch) == (width, height, channels)
    assert [bytes(r) for r in rows] == pixels


def test_multiple_idat_chunks_concatenate():
    """Spec §5.6: pixel data may be split across IDAT chunks at any
    byte boundary."""
    w, h, ch, rows = decode_png(TINY)
    full = encode_png(rows, w, h, ch)
    # split the single IDAT into two
    off = 8
    out = full[:8]
    while off + 8 <= len(full):
        (length,) = struct.unpack(">I", full[off : off + 4])
        typ = full[off + 4 : off + 8]
        body = full[off + 8 : off + 8 + length]
        if typ == b"IDAT" and length > 4:
            for part in (body[: length // 2], body[length // 2 :]):
                out += struct.pack(">I", len(part)) + b"IDAT" + part
                out += struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
        else:
            out += full[off : off + 12 + length]
        off += 12 + length
    w2, h2, ch2, rows2 = decode_png(out)
    assert (w2, h2, ch2) == (w, h, ch)
    assert [bytes(r) for r in rows2] == [bytes(r) for r in rows]


def test_resize_nearest_dims_and_identity():
    w, h, ch, rows = decode_png(TINY)
    small = resize_nearest(rows, w, h, ch, 3, 2)
    assert len(small) == 2 and all(len(r) == 3 * ch for r in small)
    same = resize_nearest(rows, w, h, ch, w, h)
    assert [bytes(r) for r in same] == [bytes(r) for r in rows]


@pytest.mark.parametrize(
    "data",
    [b"", b"hello world", b"\x89PNG\r\n\x1a\x08" + b"x" * 50, TINY[:20]],
)
def test_undecodable_raises_value_error(data):
    with pytest.raises(ValueError):
        decode_png(data)

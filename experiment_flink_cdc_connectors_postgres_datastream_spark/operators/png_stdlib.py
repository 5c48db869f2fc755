"""Minimal stdlib-only PNG codec (zlib + struct).

Implements the subset of the public PNG specification (W3C PNG, RFC
2083) needed so that ``use_real_decoder=True`` in
:mod:`operators.multimodal` executes a REAL codec even where PIL is
not installable (this container): 8-bit samples, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace, all five scanline
filters (None/Sub/Up/Average/Paeth, spec §9). Multiple IDAT chunks are
concatenated per spec §5.6.

Scope: a correctness fallback for the optional-dependency gate, not a
production codec — per-pixel Python loops are fine for test images;
at scale the PIL path (Arrow-batched, C-backed) is the real decoder,
exactly like psycopg2 vs pg_minimal on the database side.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: public alias: callers use this to distinguish "not a PNG at all"
#: (missing-codec territory when PIL is absent) from corrupt PNG data
PNG_SIGNATURE = _SIG
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, list[bytearray]]:
    """Parse + inflate + unfilter a PNG.

    Returns ``(width, height, channels, rows)`` where ``rows`` is one
    ``bytearray`` of ``width * channels`` reconstructed samples per
    scanline. Raises ``ValueError`` on anything outside the supported
    subset (callers treat that as "undecodable" and emit a sentinel).
    """
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    off, ihdr, idat = 8, None, []
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        typ = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        off += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    try:
        width, height, depth, color, _comp, _filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
    except struct.error as e:  # short IHDR body
        raise ValueError(f"malformed IHDR: {e}") from e
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
        )
    channels = _CHANNELS[color]
    stride = width * channels
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt deflate stream
        raise ValueError(f"corrupt IDAT deflate data: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise ValueError("pixel data length mismatch")
    rows: list[bytearray] = []
    prior = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prior[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prior[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        rows.append(line)
        prior = line
    return width, height, channels, rows


def encode_png(rows: list[bytearray], width: int, height: int, channels: int) -> bytes:
    """Serialize reconstructed scanlines back to a valid PNG (filter 0
    on every row — simplicity over compression ratio)."""
    color = _COLOR_TYPE[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    rows: list[bytearray],
    width: int,
    height: int,
    channels: int,
    target_width: int,
    target_height: int,
) -> list[bytearray]:
    """Nearest-neighbor resample (the classic pixel-center mapping
    ``src = floor((dst + 0.5) * in/out)``)."""
    out: list[bytearray] = []
    for ty in range(target_height):
        sy = min(int((ty + 0.5) * height / target_height), height - 1)
        src = rows[sy]
        line = bytearray(target_width * channels)
        for tx in range(target_width):
            sx = min(int((tx + 0.5) * width / target_width), width - 1)
            line[tx * channels : (tx + 1) * channels] = src[
                sx * channels : (sx + 1) * channels
            ]
        out.append(line)
    return out

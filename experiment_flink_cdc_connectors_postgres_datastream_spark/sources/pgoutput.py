"""pgoutput (logical replication protocol v1) decoder for the CDC
source — the reference's own decoding plugin
(StreamingJobWithCustomDeserializer.java:67 `decoding.plugin.name`):
managed Postgres offerings ship pgoutput universally, while wal2json
is an optional extension, so a real deployment usually has only this
path available.

The decoder is deliberately tiny and stateful: `Relation` messages
register (oid → schema/table/columns/types) and `Begin` carries the
transaction's xid + commit timestamp; `Insert`/`Update`/`Delete`
messages are translated into the SAME record dicts the wal2json v2
path produces (`action`/`schema`/`table`/`columns`/`identity`/
`timestamp_ms`/`xid`), so everything downstream —
`wal2json_to_envelope`, offset planning, replay — is shared verbatim
between the two plugins.

Wire format (PostgreSQL docs, "Logical Replication Message Formats",
protocol version 1; all integers big-endian):

    Begin     'B' final_lsn:8 commit_ts_us:8 xid:4
    Commit    'C' flags:1 commit_lsn:8 end_lsn:8 commit_ts_us:8
    Relation  'R' oid:4 namespace:cstr relname:cstr replident:1
                  ncols:2 { flags:1 name:cstr type_oid:4 typmod:4 }*
    Insert    'I' oid:4 'N' tuple
    Update    'U' oid:4 [ 'K'|'O' tuple ] 'N' tuple
    Delete    'D' oid:4 'K'|'O' tuple
    tuple     ncols:2 { 'n' | 'u' | 't' len:4 bytes }*

Timestamps count microseconds since 2000-01-01 (the Postgres epoch).
Text-mode tuple values arrive as strings; the Relation message's type
oids restore the numeric/bool typing wal2json emits natively, so both
plugins produce identical envelopes for the same change stream.
"""

from __future__ import annotations

import struct
from typing import Any

#: 2000-01-01T00:00:00Z in unix milliseconds (Postgres timestamp epoch)
PG_EPOCH_UNIX_MS = 946_684_800_000

#: type oids → Python conversion for text-mode tuple values (the
#: common scalar types; anything else stays a string, like wal2json)
_INT_OIDS = {20, 21, 23, 26}          # int8, int2, int4, oid
_FLOAT_OIDS = {700, 701, 1700}        # float4, float8, numeric
_BOOL_OID = 16


def _convert(value: str, type_oid: int) -> Any:
    if type_oid in _INT_OIDS:
        return int(value)
    if type_oid in _FLOAT_OIDS:
        return float(value)
    if type_oid == _BOOL_OID:
        return value in ("t", "true")
    return value


class _Reader:
    """Cursor over one message's bytes."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError(f"pgoutput: truncated message at offset {self.pos}")
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack(">H", self.take(2))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def cstr(self) -> str:
        end = self.buf.index(b"\0", self.pos)
        out = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return out


class PgOutputDecoder:
    """Stateful decoder: feed each replication message (in stream
    order) with its LSN; row-change messages return a wal2json-v2-
    shaped record dict, everything else returns None after updating
    decoder state. Re-decoding from the slot's restart point (the
    peek-don't-consume pattern) is safe: Relation registration and
    Begin bookkeeping are idempotent."""

    def __init__(self) -> None:
        self._relations: dict[int, dict[str, Any]] = {}
        self._xid = 0
        self._ts_ms = 0

    def decode(self, lsn_int: int, buf: bytes) -> dict[str, Any] | None:
        if not buf:
            return None
        tag = buf[:1]
        r = _Reader(buf[1:])
        if tag == b"B":
            r.take(8)  # final lsn
            self._ts_ms = r.i64() // 1000 + PG_EPOCH_UNIX_MS
            self._xid = r.u32()
            return None
        if tag == b"R":
            oid = r.u32()
            schema = r.cstr()
            table = r.cstr()
            r.u8()  # replica identity setting
            ncols = r.u16()
            cols = []
            for _ in range(ncols):
                r.u8()  # per-column flags (1 = part of key)
                name = r.cstr()
                type_oid = r.u32()
                r.take(4)  # typmod
                cols.append((name, type_oid))
            self._relations[oid] = {"schema": schema, "table": table, "cols": cols}
            return None
        if tag == b"I":
            rel = self._rel(r.u32())
            kind = r.take(1)
            if kind != b"N":
                raise ValueError(f"pgoutput: INSERT without new tuple (got {kind!r})")
            return self._record("I", rel, lsn_int, columns=self._tuple(r, rel))
        if tag == b"U":
            rel = self._rel(r.u32())
            identity = None
            kind = r.take(1)
            if kind in (b"K", b"O"):
                identity = self._tuple(r, rel)
                kind = r.take(1)
            if kind != b"N":
                raise ValueError(f"pgoutput: UPDATE without new tuple (got {kind!r})")
            return self._record("U", rel, lsn_int, columns=self._tuple(r, rel), identity=identity)
        if tag == b"D":
            rel = self._rel(r.u32())
            kind = r.take(1)
            if kind not in (b"K", b"O"):
                raise ValueError(f"pgoutput: DELETE without key/old tuple (got {kind!r})")
            return self._record("D", rel, lsn_int, identity=self._tuple(r, rel))
        # 'C' Commit, 'Y' Type, 'T' Truncate, 'M' Message, 'O' Origin:
        # no row change to emit (TRUNCATE is dropped like wal2json v2's
        # non-I/U/D actions)
        return None

    def _rel(self, oid: int) -> dict[str, Any]:
        rel = self._relations.get(oid)
        if rel is None:
            raise ValueError(
                f"pgoutput: change for unregistered relation oid {oid} "
                "(Relation message not yet seen — stream decoded out of order?)"
            )
        return rel

    def _tuple(self, r: _Reader, rel: dict[str, Any]) -> list[dict[str, Any]]:
        ncols = r.u16()
        out = []
        for i in range(ncols):
            kind = r.take(1)
            name, type_oid = rel["cols"][i]
            if kind == b"n":          # SQL NULL
                out.append({"name": name, "value": None})
            elif kind == b"u":
                # unchanged TOAST value: the server does NOT send the
                # bytes (the column is out-of-line and the UPDATE did
                # not touch it). Dropping the column here silently
                # turned such updates into NULL overwrites downstream
                # — the classic CDC TOAST trap. Mark it instead; the
                # envelope translation surfaces the marked names so
                # consumers can carry the last available value
                # forward (cdc.changelog.resolve_unavailable).
                out.append({"name": name, "value": None, "unavailable": True})
            elif kind == b"t":        # text-mode value
                raw = r.take(r.u32()).decode("utf-8")
                out.append({"name": name, "value": _convert(raw, type_oid)})
            else:
                raise ValueError(f"pgoutput: unsupported tuple value kind {kind!r}")
        return out

    def _record(
        self,
        action: str,
        rel: dict[str, Any],
        lsn_int: int,
        columns: list[dict[str, Any]] | None = None,
        identity: list[dict[str, Any]] | None = None,
    ) -> dict[str, Any]:
        rec: dict[str, Any] = {
            "action": action,
            "schema": rel["schema"],
            "table": rel["table"],
            "timestamp_ms": self._ts_ms,
            "lsn_int": lsn_int,
            "xid": self._xid,
        }
        if columns is not None:
            rec["columns"] = columns
        if identity is not None:
            rec["identity"] = identity
        return rec

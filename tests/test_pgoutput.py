"""pgoutput decoder: wire-format parsing, typed value restoration,
and envelope equivalence with the wal2json path (the two plugins must
be indistinguishable downstream)."""

from __future__ import annotations

import json
import struct

import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.pgoutput import (
    PG_EPOCH_UNIX_MS,
    PgOutputDecoder,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import wal2json_to_envelope


def _cstr(s: str) -> bytes:
    return s.encode() + b"\0"


def msg_begin(xid: int, ts_unix_ms: int, final_lsn: int = 0) -> bytes:
    ts_us = (ts_unix_ms - PG_EPOCH_UNIX_MS) * 1000
    return b"B" + struct.pack(">Qq I".replace(" ", ""), final_lsn, ts_us, xid)


def msg_relation(oid: int, schema: str, table: str, cols: list[tuple[str, int]]) -> bytes:
    out = b"R" + struct.pack(">I", oid) + _cstr(schema) + _cstr(table) + b"f"
    out += struct.pack(">H", len(cols))
    for name, type_oid in cols:
        out += b"\x01" + _cstr(name) + struct.pack(">Ii", type_oid, -1)
    return out


def _tuple(values: list[str | None]) -> bytes:
    out = struct.pack(">H", len(values))
    for v in values:
        if v is None:
            out += b"n"
        else:
            raw = v.encode()
            out += b"t" + struct.pack(">I", len(raw)) + raw
    return out


def msg_insert(oid: int, values: list[str | None]) -> bytes:
    return b"I" + struct.pack(">I", oid) + b"N" + _tuple(values)


def msg_update(oid: int, old: list[str | None], new: list[str | None]) -> bytes:
    return b"U" + struct.pack(">I", oid) + b"O" + _tuple(old) + b"N" + _tuple(new)


def msg_delete(oid: int, old: list[str | None]) -> bytes:
    return b"D" + struct.pack(">I", oid) + b"O" + _tuple(old)


def msg_commit(lsn: int, ts_unix_ms: int) -> bytes:
    ts_us = (ts_unix_ms - PG_EPOCH_UNIX_MS) * 1000
    return b"C" + b"\0" + struct.pack(">QQq", lsn, lsn, ts_us)


USERS_OID = 51234
USERS_COLS = [("id", 20), ("full_name", 25)]  # int8, text


def _decode_stream(msgs: list[tuple[int, bytes]]) -> list[dict]:
    d = PgOutputDecoder()
    out = []
    for lsn, m in msgs:
        rec = d.decode(lsn, m)
        if rec is not None:
            out.append(rec)
    return out


def test_insert_update_delete_roundtrip():
    recs = _decode_stream(
        [
            (0, msg_begin(xid=100, ts_unix_ms=1000)),
            (0, msg_relation(USERS_OID, "schema1", "users", USERS_COLS)),
            (10, msg_insert(USERS_OID, ["2", "anne smith"])),
            (11, msg_commit(11, 1000)),
            (0, msg_begin(xid=101, ts_unix_ms=2000)),
            (20, msg_update(USERS_OID, ["1", "susan smith"], ["1", "sue smith"])),
            (21, msg_commit(21, 2000)),
            (0, msg_begin(xid=102, ts_unix_ms=3000)),
            (30, msg_delete(USERS_OID, ["2", "anne smith"])),
        ]
    )
    assert [r["action"] for r in recs] == ["I", "U", "D"]
    ins, upd, dele = recs
    # typed values restored from the Relation message's type oids
    assert ins["columns"] == [{"name": "id", "value": 2}, {"name": "full_name", "value": "anne smith"}]
    assert ins["xid"] == 100 and ins["timestamp_ms"] == 1000 and ins["lsn_int"] == 10
    assert upd["identity"][1]["value"] == "susan smith"
    assert upd["columns"][1]["value"] == "sue smith"
    assert dele["identity"][0] == {"name": "id", "value": 2}
    assert "columns" not in dele


def test_envelope_equivalence_with_wal2json():
    """The same logical change decoded from pgoutput bytes or parsed
    from wal2json v2 JSON must produce byte-identical envelopes."""
    [pg_rec] = _decode_stream(
        [
            (0, msg_begin(xid=101, ts_unix_ms=2000)),
            (0, msg_relation(USERS_OID, "schema1", "users", USERS_COLS)),
            (20, msg_update(USERS_OID, ["1", "susan smith"], ["1", "sue smith"])),
        ]
    )
    w2j_rec = {
        "action": "U",
        "schema": "schema1",
        "table": "users",
        "columns": [
            {"name": "id", "value": 1},
            {"name": "full_name", "value": "sue smith"},
        ],
        "identity": [
            {"name": "id", "value": 1},
            {"name": "full_name", "value": "susan smith"},
        ],
        "timestamp_ms": 2000,
        "lsn_int": 20,
        "xid": 101,
    }
    assert wal2json_to_envelope(pg_rec, "db1") == wal2json_to_envelope(w2j_rec, "db1")
    env = json.loads(wal2json_to_envelope(pg_rec, "db1"))
    assert env["op"] == "u" and env["source"]["lsn"] == 20


def test_null_and_unchanged_toast_values():
    d = PgOutputDecoder()
    d.decode(0, msg_begin(xid=1, ts_unix_ms=0))
    d.decode(0, msg_relation(7, "s", "t", [("a", 23), ("b", 25), ("c", 25)]))
    # column b carries an unchanged TOAST marker ('u'): not re-sent —
    # surfaced as an explicitly MARKED null (dropping it silently read
    # as "column gone" downstream and nulled materialized state)
    buf = b"I" + struct.pack(">I", 7) + b"N" + struct.pack(">H", 3)
    buf += b"t" + struct.pack(">I", 1) + b"5"
    buf += b"u"
    buf += b"n"
    rec = d.decode(5, buf)
    assert rec["columns"] == [
        {"name": "a", "value": 5},
        {"name": "b", "value": None, "unavailable": True},
        {"name": "c", "value": None},
    ]


def test_type_conversion_families():
    d = PgOutputDecoder()
    d.decode(0, msg_begin(xid=1, ts_unix_ms=0))
    d.decode(
        0,
        msg_relation(
            8,
            "s",
            "t",
            [("i2", 21), ("f8", 701), ("num", 1700), ("ok", 16), ("txt", 25)],
        ),
    )
    rec = d.decode(5, msg_insert(8, ["7", "1.5", "2.25", "t", "x"]))
    assert [c["value"] for c in rec["columns"]] == [7, 1.5, 2.25, True, "x"]


def test_unregistered_relation_raises():
    d = PgOutputDecoder()
    d.decode(0, msg_begin(xid=1, ts_unix_ms=0))
    with pytest.raises(ValueError, match="unregistered relation"):
        d.decode(5, msg_insert(999, ["1"]))


def test_non_row_messages_return_none():
    d = PgOutputDecoder()
    assert d.decode(0, msg_begin(xid=1, ts_unix_ms=0)) is None
    assert d.decode(0, msg_relation(1, "s", "t", [("a", 23)])) is None
    assert d.decode(0, msg_commit(5, 0)) is None
    assert d.decode(0, b"O" + b"\0" * 9) is None  # Origin: ignored


def test_config_parses_publication_and_plugin():
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import PostgresCDCConfig

    cfg = PostgresCDCConfig.from_options(
        {"plugin_name": "pgoutput", "publication_names": "my_pub"}
    )
    assert cfg.plugin_name == "pgoutput" and cfg.publication_names == "my_pub"


def test_unchanged_toast_marked_and_enveloped():
    """pgoutput tuple kind 'u' (unchanged TOAST value, bytes not on
    the wire) must NOT silently vanish: the decoder marks the column,
    the envelope lists it under `unavailable`, and the after-image
    carries NULL (distinguishable from a real NULL precisely via the
    list)."""

    def _tuple_with_u(values):
        out = struct.pack(">H", len(values))
        for v in values:
            if v == "__U__":
                out += b"u"
            elif v is None:
                out += b"n"
            else:
                raw = v.encode()
                out += b"t" + struct.pack(">I", len(raw)) + raw
        return out

    upd = (
        b"U"
        + struct.pack(">I", USERS_OID)
        + b"K"
        + _tuple_with_u(["7", None])
        + b"N"
        + _tuple_with_u(["7", "__U__"])
    )
    recs = _decode_stream(
        [
            (0, msg_begin(9, 1_700_000_000_000)),
            (0, msg_relation(USERS_OID, "public", "users", USERS_COLS)),
            (105, upd),
            (0, msg_commit(106, 1_700_000_000_000)),
        ]
    )
    assert len(recs) == 1
    cols = {c["name"]: c for c in recs[0]["columns"]}
    assert cols["full_name"]["value"] is None
    assert cols["full_name"].get("unavailable") is True
    assert "unavailable" not in cols["id"]

    env = json.loads(wal2json_to_envelope(recs[0], "postgres"))
    assert env["unavailable"] == ["full_name"]
    assert env["after"]["full_name"] is None
    assert env["after"]["id"] == 7

    # ordinary changes keep their old wire bytes: no unavailable key
    ins = _decode_stream(
        [
            (0, msg_begin(10, 1_700_000_000_000)),
            (0, msg_relation(USERS_OID, "public", "users", USERS_COLS)),
            (107, msg_insert(USERS_OID, ["8", "bob"])),
        ]
    )
    env2 = json.loads(wal2json_to_envelope(ins[0], "postgres"))
    assert "unavailable" not in env2

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


def test_pgoutput_decoder_roundtrip_property():
    """Property round-trip against an INDEPENDENT encoder written from
    the protocol spec (PostgreSQL 'Logical Replication Message
    Formats', protocol v1): random relations (1-5 columns across
    text/int8/bool/float8/int4), random transactions and I/U/D
    streams with NULLs, unchanged-TOAST 'u' kinds, unicode values,
    and updates with/without K/O old tuples must decode to exactly
    the intended record dicts — typed values, unavailable markers,
    xid and Postgres-epoch timestamp conversion included."""
    import random
    import struct

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.pgoutput import PG_EPOCH_UNIX_MS, PgOutputDecoder

    def cstr(s):
        return s.encode() + b"\0"

    def enc_tuple(kinds_vals):
        out = struct.pack(">H", len(kinds_vals))
        for kv in kinds_vals:
            if kv in ("n", "u"):
                out += kv.encode()
            else:
                b = kv[1].encode()
                out += b"t" + struct.pack(">I", len(b)) + b
        return out

    def msg_begin(ts_us, xid):
        return b"B" + struct.pack(">q", 0) + struct.pack(">q", ts_us) + struct.pack(">I", xid)

    def msg_relation(oid, schema, table, cols):
        out = b"R" + struct.pack(">I", oid) + cstr(schema) + cstr(table) + b"f"
        out += struct.pack(">H", len(cols))
        for name, toid in cols:
            out += b"\x01" + cstr(name) + struct.pack(">I", toid) + struct.pack(">i", -1)
        return out

    # (type oid, generator of (wire_text, expected_python))
    def gen_value(rng, toid):
        if toid == 20:  # int8
            v = rng.randint(-(2**40), 2**40)
            return str(v), v
        if toid == 23:  # int4
            v = rng.randint(-(2**31), 2**31 - 1)
            return str(v), v
        if toid == 16:  # bool
            return ("t", True) if rng.random() < 0.5 else ("f", False)
        if toid == 701:  # float8 — exact text round-trip by construction
            v = float(rng.randint(-1000, 1000)) / 8
            return repr(v), v
        v = rng.choice(["plain", "uni-é中文", 'q"uo\\te', "", "x" * 200])
        return v, v

    for seed in (5, 42, 777):
        rng = random.Random(seed)
        dec = PgOutputDecoder()
        toids = [25, 20, 16, 701, 23]
        for rel_i in range(6):
            oid = 1000 + rel_i
            cols = [
                (f"c{j}", rng.choice(toids))
                for j in range(rng.randint(1, 5))
            ]
            schema, table = f"s{rel_i}", f"t{rel_i}"
            assert dec.decode(1, msg_relation(oid, schema, table, cols)) is None
            ts_us = rng.randint(0, 10**15)
            xid = rng.randint(1, 2**31)
            assert dec.decode(2, msg_begin(ts_us, xid)) is None
            lsn = rng.randint(1, 2**50)
            action = rng.choice(["I", "U", "U", "D"])

            def draw_tuple(allow_unavail):
                wire, expect = [], []
                for name, toid in cols:
                    roll = rng.random()
                    if roll < 0.15:
                        wire.append("n")
                        expect.append({"name": name, "value": None})
                    elif allow_unavail and roll < 0.3:
                        wire.append("u")
                        expect.append({"name": name, "value": None, "unavailable": True})
                    else:
                        w, e = gen_value(rng, toid)
                        wire.append(("t", w))
                        expect.append({"name": name, "value": e})
                return wire, expect

            if action == "I":
                wire, expect = draw_tuple(allow_unavail=False)
                buf = b"I" + struct.pack(">I", oid) + b"N" + enc_tuple(wire)
                rec = dec.decode(lsn, buf)
                assert rec["columns"] == expect and "identity" not in rec
            elif action == "U":
                with_old = rng.random() < 0.5
                old_wire, old_expect = draw_tuple(allow_unavail=False)
                new_wire, new_expect = draw_tuple(allow_unavail=True)
                buf = b"U" + struct.pack(">I", oid)
                if with_old:
                    buf += rng.choice([b"K", b"O"]) + enc_tuple(old_wire)
                buf += b"N" + enc_tuple(new_wire)
                rec = dec.decode(lsn, buf)
                assert rec["columns"] == new_expect
                assert rec.get("identity") == (old_expect if with_old else None) or (
                    not with_old and "identity" not in rec
                )
            else:
                old_wire, old_expect = draw_tuple(allow_unavail=False)
                buf = b"D" + struct.pack(">I", oid) + rng.choice([b"K", b"O"]) + enc_tuple(old_wire)
                rec = dec.decode(lsn, buf)
                assert rec["identity"] == old_expect and "columns" not in rec
            assert rec["action"] == action
            assert rec["schema"] == schema and rec["table"] == table
            assert rec["lsn_int"] == lsn and rec["xid"] == xid
            assert rec["timestamp_ms"] == ts_us // 1000 + PG_EPOCH_UNIX_MS

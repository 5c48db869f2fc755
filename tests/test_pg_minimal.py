"""Unit tests for the pure parts of the minimal Postgres client
(`sources.pg_minimal`): parameter quoting, OID-typed value decoding,
and wire-message framing helpers. The live protocol path is covered
end-to-end by tools/run_live_cdc_test.sh → tests/test_postgres_cdc_live.py."""

from __future__ import annotations

import struct

import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.pg_minimal import (
    Connection,
    _decode,
    _quote,
)


def test_quote_scalars():
    assert _quote(None) == "NULL"
    assert _quote(True) == "TRUE" and _quote(False) == "FALSE"
    assert _quote(42) == "42"
    assert _quote("plain") == "'plain'"
    assert _quote("it's") == "'it''s'"
    # backslashes switch to E'' escapes (standard_conforming safe)
    assert _quote("a\\b") == "E'a\\\\b'"
    assert _quote("quote'and\\slash") == "E'quote''and\\\\slash'"


def test_quote_lists_render_arrays():
    assert _quote(["s1", "s2"]) == "ARRAY['s1','s2']"
    assert _quote([1, 2]) == "ARRAY[1,2]"


def test_decode_by_oid():
    assert _decode(None, 25) is None
    assert _decode(b"t", 16) is True and _decode(b"f", 16) is False
    assert _decode(b"123", 20) == 123 and isinstance(_decode(b"7", 23), int)
    assert _decode(b"1.5", 701) == 1.5
    assert _decode(b"0/1528B10", 3220) == "0/1528B10"  # pg_lsn stays text
    assert _decode(b"\\x68690a", 17) == b"hi\n"  # bytea hex


def test_error_text_extraction():
    payload = b"SERROR\x00C42P01\x00Mrelation does not exist\x00\x00"
    msg = Connection._error_text(payload)
    assert "relation does not exist" in msg and "42P01" in msg


def test_execute_interpolation_shape():
    """%s rendering must produce exactly the statement psycopg2 would
    send for the CDC client's parameterized calls."""
    sql = "SELECT 1 FROM pg_replication_slots WHERE slot_name = %s"
    rendered = sql % tuple(_quote(p) for p in ("my_slot",))
    assert rendered == "SELECT 1 FROM pg_replication_slots WHERE slot_name = 'my_slot'"
    sql2 = "... WHERE table_schema = ANY(%s)"
    assert (sql2 % (_quote(["s1", "s2"]),)) == "... WHERE table_schema = ANY(ARRAY['s1','s2'])"


def test_row_description_struct_size():
    """The RowDescription per-field trailer layout used by the parser
    (int32 tableoid, int16 attnum, int32 typoid, int16 typlen,
    int32 typmod, int16 format) is 18 bytes."""
    assert struct.calcsize(">IHIhiH") == 18


def test_scram_sha256_rfc7677_vectors():
    """The SCRAM-SHA-256 proof math must reproduce RFC 7677 §3's
    published example exactly (user 'user', password 'pencil')."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.pg_minimal import (
        scram_sha256_client_final,
    )

    client_first_bare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (
        "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    final, server_sig = scram_sha256_client_final("pencil", client_first_bare, server_first)
    assert final == (
        "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    assert server_sig == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="


def test_quote_non_finite_floats():
    """repr() of inf/nan is not SQL; Postgres accepts the quoted
    spellings cast to float8 (same concern as similarity.py's _fd for
    Spark literals)."""
    assert _quote(float("nan")) == "'NaN'::float8"
    assert _quote(float("inf")) == "'Infinity'::float8"
    assert _quote(float("-inf")) == "'-Infinity'::float8"
    assert _quote(1.5) == "1.5"


def test_executemany_batches_one_round_trip_per_chunk():
    """executemany renders every parameter set and sends each ≤500-
    statement chunk as ONE multi-statement simple query (one implicit
    transaction, one round trip)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.pg_minimal import Cursor

    sent = []

    class FakeConn:
        def _query(self, sql):
            sent.append(sql)
            return None, []

    cur = Cursor(FakeConn())
    cur.executemany(
        "INSERT INTO t (k, v) VALUES (%s, %s)",
        [(i, f"name {i}") for i in range(1200)],
    )
    assert len(sent) == 3  # 500 + 500 + 200
    first = sent[0].split("; ")
    assert len(first) == 500
    assert first[0] == "INSERT INTO t (k, v) VALUES (0, 'name 0')"
    assert sent[2].split("; ")[-1] == "INSERT INTO t (k, v) VALUES (1199, 'name 1199')"

"""Postgres CDC source tests with a fake replication client (no
server in this container): snapshot→WAL handoff, offset bookkeeping,
wal2json→Debezium translation, and end-to-end compatibility with the
engine's parse/compact pipeline.

Graded-row pin index (tests/test_plans.py's batch-plan sweep): this
module pins the production reader machinery behind the engine-driven
rows `cdc_wal_tail`, `cdc_wal_tail_resume`, `cdc_snapshot_chunked`,
`cdc_snapshot_resume`, and `cdc_snapshot_tail_handoff` (offset
planning, keyset pagination, pacing, restart triage, the option
gate)."""

from __future__ import annotations

import json

import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc import parse_cdc, project_flat, with_key
from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import count_live_by
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.reference_surface import USERS_ROW_SCHEMA
from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import (
    PostgresCDCConfig,
    PostgresCDCStreamReader,
    snapshot_row_to_envelope,
    wal2json_to_envelope,
)

from soakopt import soak_examples


class FakeClient:
    """Scripted replication client with real slot semantics: changes
    arrive over time (one queued batch surfaces per peek) and stay in
    the slot until ``advance_slot`` consumes them — mirroring
    ``pg_logical_slot_peek_changes`` + ``pg_replication_slot_advance``."""

    def __init__(self):
        self.slot_created = False
        self.confirmed_lsn = 0
        self.wal = []  # changes visible in the slot, in lsn order
        self.snapshot = {("schema1", "users"): [{"id": 1, "full_name": "susan smith"}]}
        self.change_queue = [
            [
                {
                    "action": "I",
                    "schema": "schema1",
                    "table": "users",
                    "columns": [
                        {"name": "id", "value": 2},
                        {"name": "full_name", "value": "anne smith"},
                    ],
                    "timestamp_ms": 1000,
                    "lsn_int": 10,
                    "xid": 100,
                },
                {"action": "B"},  # begin marker: must be skipped
            ],
            [
                {
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
                },
            ],
            [],
        ]

        self.pks = {("schema1", "users"): ["id"]}
        self.progress = None  # the durable snapshot-progress row

    def save_snapshot_progress(self, pos_json):
        self.progress = pos_json

    def load_snapshot_progress(self):
        if self.progress is None:
            return None
        ti, key = json.loads(self.progress)
        return (ti, key)

    def clear_snapshot_progress(self):
        self.progress = None

    def ensure_slot(self):
        created = not self.slot_created
        self.slot_created = True
        return created

    def list_tables(self):
        return sorted(self.snapshot)

    def primary_key(self, schema, table):
        return self.pks.get((schema, table), [])

    def chunk_bound(self, schema, table, pk_cols, lower, chunk_size):
        keys = sorted(tuple(r[c] for c in pk_cols) for r in self.snapshot[(schema, table)])
        if lower is not None:
            keys = [k for k in keys if k > tuple(lower)]
        return list(keys[chunk_size - 1]) if len(keys) >= chunk_size else None

    def snapshot_range(self, schema, table, pk_cols, lower, upper):
        for r in self.snapshot[(schema, table)]:
            if pk_cols:
                k = tuple(r[c] for c in pk_cols)
                if lower is not None and k <= tuple(lower):
                    continue
                if upper is not None and k > tuple(upper):
                    continue
            yield r

    def peek_changes(self, limit):
        if self.change_queue:  # new WAL arrives between polls
            self.wal.extend(self.change_queue.pop(0))
        return [c for c in self.wal if c.get("lsn_int", 0) > self.confirmed_lsn][:limit]

    def advance_slot(self, lsn):
        self.confirmed_lsn = max(self.confirmed_lsn, lsn)
        self.wal = [c for c in self.wal if c.get("lsn_int", 0) > self.confirmed_lsn]

    def slot_confirmed_lsn(self):
        return self.confirmed_lsn


@pytest.fixture()
def reader():
    return PostgresCDCStreamReader(PostgresCDCConfig(), client=FakeClient())


def _drain(reader):
    """Simulate the micro-batch loop: initialOffset → latestOffset →
    partitions → read, until offsets stop advancing."""
    rows = []
    start = reader.initialOffset()
    while True:
        end = reader.latestOffset()
        if end == start:
            break
        for p in reader.partitions(start, end):
            rows.extend(reader.read(p))
        reader.commit(end)
        start = end
    return rows


def test_snapshot_then_wal_handoff(reader):
    rows = _drain(reader)
    envs = [json.loads(v) for v, _, _ in rows]
    assert [e["op"] for e in envs] == ["r", "c", "u"]
    assert reader.client.slot_created            # slot created before snapshot emit
    assert envs[0]["after"]["full_name"] == "susan smith"
    assert envs[2]["before"]["full_name"] == "susan smith"
    assert envs[2]["after"]["full_name"] == "sue smith"
    lsns = [lsn for _, lsn, _ in rows]
    assert lsns == [0, 10, 20]                   # monotone offsets


def test_offsets_advance_and_commit_clears_buffers(reader):
    _drain(reader)
    assert reader._pending == {}
    assert reader._snap_chunks == {}  # committed chunk plans pruned too


def test_wal2json_translation_skips_non_row_actions():
    assert wal2json_to_envelope({"action": "B"}, "db") is None
    assert wal2json_to_envelope({"action": "C"}, "db") is None
    env = json.loads(
        wal2json_to_envelope(
            {
                "action": "D",
                "schema": "s",
                "table": "t",
                "identity": [{"name": "id", "value": 7}],
                "timestamp_ms": 5,
                "lsn_int": 99,
            },
            "db",
        )
    )
    assert env["op"] == "d" and env["after"] is None and env["before"] == {"id": 7}
    assert env["source"]["lsn"] == 99


def test_wal2json_update_marks_omitted_toast_columns():
    """Real wal2json output OMITS an unchanged-TOAST column from the
    new tuple (no in-band marker, unlike pgoutput's 'u' kind). Under
    REPLICA IDENTITY FULL the old tuple still names it — the diff is
    the unavailable list. PK-identity updates (identity ⊆ columns)
    must stay markerless: their wire bytes are unchanged."""
    env = json.loads(
        wal2json_to_envelope(
            {
                "action": "U",
                "schema": "s",
                "table": "docs",
                # new tuple omits `body` — unchanged TOAST
                "columns": [{"name": "id", "value": 1}, {"name": "n", "value": 2}],
                # REPLICA IDENTITY FULL old tuple has the full column set
                "identity": [
                    {"name": "id", "value": 1},
                    {"name": "n", "value": 1},
                    {"name": "body", "value": "BIG" * 100},
                ],
                "timestamp_ms": 5,
                "lsn_int": 100,
            },
            "db",
        )
    )
    assert env["unavailable"] == ["body"]
    assert env["after"] == {"id": 1, "n": 2, "body": None}  # pgoutput envelope shape
    # default (PK) replica identity: no omission detectable, no marker
    env = json.loads(
        wal2json_to_envelope(
            {
                "action": "U",
                "schema": "s",
                "table": "docs",
                "columns": [{"name": "id", "value": 1}, {"name": "n", "value": 2}],
                "identity": [{"name": "id", "value": 1}],
                "timestamp_ms": 5,
                "lsn_int": 101,
            },
            "db",
        )
    )
    assert "unavailable" not in env


def test_source_rows_flow_through_engine_pipeline(spark, reader):
    rows = _drain(reader)
    df = spark.createDataFrame(rows, "value string, lsn long, ts_ms long")
    flat = with_key(
        project_flat(parse_cdc(df.select("value"), USERS_ROW_SCHEMA), "users", ["id", "full_name"]),
        "schema",
        "id",
    )
    counts = {
        r["schema"]: r["user_count"]
        for r in count_live_by(flat, ["schema"], ["key"], ["ts_ms", "lsn"], op_col="op").collect()
    }
    assert counts == {"schema1": 2}


def test_datasource_registration(spark):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import RAW_CDC_SCHEMA, register

    register(spark)
    df = spark.readStream.format("postgres_cdc").option("hostname", "h").load()
    assert df.isStreaming and df.schema == RAW_CDC_SCHEMA


def test_restart_replays_uncommitted_batch_from_slot():
    """Driver crash between planning and commit: the slot was never
    advanced, so a fresh reader must re-serve the checkpointed span by
    re-peeking — not silently return empty (the round-1 data-loss bug)."""
    client = FakeClient()
    r1 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    snap = r1.latestOffset()       # snapshot planned (single batch here)
    assert snap["phase"] == "snapshot"
    r1.commit(snap)
    end = r1.latestOffset()        # wal batch with lsn=10 planned, NOT committed
    assert end == {"phase": "wal", "lsn": 11}
    # crash: new reader, same server state (slot exists, confirmed=0);
    # the engine replays (committed snapshot offset → planned wal end)
    r2 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    rows = [r for p in r2.partitions(snap, end) for r in r2.read(p)]
    envs = [json.loads(v) for v, _, _ in rows]
    assert [e["op"] for e in envs] == ["c"]
    assert envs[0]["after"]["full_name"] == "anne smith"


def test_restart_skips_snapshot_and_resumes_from_confirmed_lsn():
    """A pre-existing slot marks a restart: no second snapshot, and the
    watermark seeds from the slot's confirmed position."""
    client = FakeClient()
    r1 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    _drain(r1)                     # full run: snapshot + both wal batches committed
    r2 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    off = r2.latestOffset()
    assert r2._snapshot_done and off["phase"] == "wal"
    assert r2._snap_chunks == {}              # no re-snapshot planned
    assert off["lsn"] == client.confirmed_lsn + 1


def test_restart_before_any_commit_reruns_snapshot():
    """Crash after the slot was created but before ANY batch committed
    (confirmed_lsn still 0): the old slot-exists heuristic would skip
    the snapshot and the first planned span would silently contain WAL
    rows only. A never-advanced slot must be treated as a fresh start."""
    client = FakeClient()
    r1 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    r1.latestOffset()              # slot created, snapshot planned — then crash
    assert client.slot_created and client.confirmed_lsn == 0
    r2 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    rows = _drain(r2)              # no checkpoint survived: full re-run
    envs = [json.loads(v) for v, _, _ in rows]
    assert [e["op"] for e in envs] == ["r", "c", "u"]   # snapshot NOT dropped
    assert envs[0]["after"]["full_name"] == "susan smith"


def test_replay_of_span_beyond_peek_window():
    """Two planned-but-uncommitted spans at crash time: the second lies
    beyond the first poll_batch_size changes, so a single fixed-size
    peek can't see it. The replay (and planning) peeks must grow their
    window instead of raising/stalling."""
    client = FakeClient()
    r1 = PostgresCDCStreamReader(PostgresCDCConfig(poll_batch_size=1), client=client)
    r1.commit(r1.latestOffset())   # snapshot batch committed
    assert r1.latestOffset() == {"phase": "wal", "lsn": 11}   # span (1,11) planned
    assert r1.latestOffset() == {"phase": "wal", "lsn": 21}   # span (11,21) planned
    # crash with both spans uncommitted; a fresh reader must serve the
    # SECOND span even though peek(poll_batch_size) only shows the first
    r2 = PostgresCDCStreamReader(PostgresCDCConfig(poll_batch_size=1), client=client)
    [part] = r2.partitions({"phase": "wal", "lsn": 11}, {"phase": "wal", "lsn": 21})
    envs = [json.loads(v) for v, _, _ in part.rows]
    assert [e["op"] for e in envs] == ["u"]
    assert envs[0]["after"]["full_name"] == "sue smith"


def test_unserveable_wal_range_raises_instead_of_empty():
    client = FakeClient()
    client.slot_created = True
    client.confirmed_lsn = 100     # slot advanced past the requested span
    client.change_queue = []
    r = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    with pytest.raises(RuntimeError, match="cannot serve checkpointed offset range"):
        r.partitions({"phase": "wal", "lsn": 5}, {"phase": "wal", "lsn": 11})


def test_slot_advances_only_on_commit():
    client = FakeClient()
    r = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    r.commit(r.latestOffset())     # snapshot batch
    r.latestOffset()               # plans wal span (1, 11)
    assert client.confirmed_lsn == 0          # peek is non-destructive
    r.commit({"phase": "wal", "lsn": 11})
    assert client.confirmed_lsn == 10         # advanced to last committed change


def test_catalog_ddl_registration(spark):
    """CREATE TABLE … USING postgres_cdc — parity with the reference's
    executeSql connector DDL (SJCD:156-174): the table lives in the
    catalog and readStream.table() tails the stream with the raw CDC
    schema."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import (
        RAW_CDC_SCHEMA,
        register_cdc_table,
    )

    spark.sql("DROP TABLE IF EXISTS cdc_users_ddl")
    register_cdc_table(
        spark, "cdc_users_ddl", hostname="h", plugin_name="pgoutput", publication_names="p1"
    )
    try:
        df = spark.readStream.table("cdc_users_ddl")
        assert df.isStreaming and df.schema == RAW_CDC_SCHEMA
        assert any(t.name == "cdc_users_ddl" for t in spark.catalog.listTables())
        desc = {r["col_name"]: r["data_type"] for r in spark.sql("DESCRIBE TABLE EXTENDED cdc_users_ddl").collect()}
        assert desc.get("Name") == "postgres_cdc"  # provider recorded in catalog
        register_cdc_table(spark, "cdc_users_ddl", hostname="h")  # idempotent
    finally:
        spark.sql("DROP TABLE IF EXISTS cdc_users_ddl")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid table identifier"):
        register_cdc_table(spark, "bad name; drop")


def test_wal2json_reader_warns_about_toast_blind_spot(caplog):
    """wal2json (explicit opt-in) cannot see unchanged-TOAST omissions
    on tables without REPLICA IDENTITY FULL — the reader says so once
    at construction; the default plugin is pgoutput (the reference's
    own, ADVICE r10) and stays silent."""
    import logging

    assert PostgresCDCConfig().plugin_name == "pgoutput"
    assert PostgresCDCConfig.from_options({}).plugin_name == "pgoutput"
    with caplog.at_level(logging.WARNING):
        PostgresCDCStreamReader(
            PostgresCDCConfig(plugin_name="wal2json"), client=FakeClient()
        )
    assert any("REPLICA IDENTITY FULL" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        PostgresCDCStreamReader(PostgresCDCConfig(), client=FakeClient())
    assert not any("REPLICA IDENTITY FULL" in r.message for r in caplog.records)


def test_config_from_options_parses_lists():
    cfg = PostgresCDCConfig.from_options(
        {"schema_list": "schema1, schema2", "table_list": "users", "port": "5434"}
    )
    assert cfg.schema_list == ["schema1", "schema2"]
    assert cfg.table_list == ["users"]
    assert cfg.port == 5434


# -- chunked snapshot (round 7: keyset spans, executor-side reads) ------


def _bulk_client(n_rows=9):
    """FakeClient whose users table has n_rows rows and no queued WAL."""
    c = FakeClient()
    c.snapshot = {
        ("schema1", "users"): [
            {"id": i, "full_name": f"user {i}"} for i in range(1, n_rows + 1)
        ]
    }
    c.change_queue = [[]]
    return c


def _chunked_cfg(chunk=2, per_trigger=1):
    return PostgresCDCConfig(
        snapshot_chunk_size=chunk, snapshot_chunks_per_trigger=per_trigger
    )


def _drive(reader, start, n_batches=None):
    """Engine-style loop returning (per-batch id lists, offsets)."""
    batches, offsets, cur = [], [start], start
    while n_batches is None or len(batches) < n_batches:
        end = reader.latestOffset()
        if end == cur:
            break
        rows = [r for p in reader.partitions(cur, end) for r in reader.read(p)]
        batches.append([json.loads(v)["after"]["id"] for v, _, _ in rows if json.loads(v)["op"] == "r"])
        reader.commit(end)
        offsets.append(end)
        cur = end
    return batches, offsets


def test_snapshot_paced_over_multiple_batches():
    """9 rows at chunk_size=2, 1 chunk/trigger: the snapshot arrives
    over 5 paced micro-batches with keyset offsets, exactly once."""
    r = PostgresCDCStreamReader(_chunked_cfg(), client=_bulk_client(9))
    batches, offsets = _drive(r, r.initialOffset())
    snap_batches = [b for b in batches if b]
    assert snap_batches == [[1, 2], [3, 4], [5, 6], [7, 8], [9]]
    # offsets carry the literal key bounds through the snapshot phase
    assert offsets[1] == {"phase": "snapshot", "table": ["schema1", "users"], "key": [2]}
    assert offsets[2] == {"phase": "snapshot", "table": ["schema1", "users"], "key": [4]}
    assert offsets[5] == {"phase": "snapshot", "table": ["schema1", "users"], "key": None}


def test_snapshot_rows_never_buffer_on_driver():
    """The scale contract: snapshot partitions carry key-range chunk
    METADATA only; no snapshot row ever sits in a driver buffer."""
    client = _bulk_client(9)
    r = PostgresCDCStreamReader(_chunked_cfg(chunk=3, per_trigger=2), client=client)
    start = r.initialOffset()
    end = r.latestOffset()
    parts = r.partitions(start, end)
    assert all(p.chunk is not None and p.rows == [] for p in parts)
    assert len(parts) == 2  # per_trigger chunks, one task each
    assert r._pending == {}  # _pending is wal-only
    ids = [json.loads(v)["after"]["id"] for p in parts for v, _, _ in r.read(p)]
    assert ids == [1, 2, 3, 4, 5, 6]


def test_mid_snapshot_uncommitted_replay_on_fresh_reader():
    """Crash between planning and commit mid-snapshot: a FRESH reader
    must re-serve the checkpointed span from its literal key bounds."""
    client = _bulk_client(9)
    r1 = PostgresCDCStreamReader(_chunked_cfg(), client=client)
    o0 = r1.initialOffset()
    o1 = r1.latestOffset()
    r1.commit(o1)
    o2 = r1.latestOffset()         # planned, NOT committed — crash
    assert o1 == {"phase": "snapshot", "table": ["schema1", "users"], "key": [2]}
    assert o2 == {"phase": "snapshot", "table": ["schema1", "users"], "key": [4]}
    r2 = PostgresCDCStreamReader(_chunked_cfg(), client=client)
    ids = [
        json.loads(v)["after"]["id"]
        for p in r2.partitions(o1, o2)
        for v, _, _ in r2.read(p)
    ]
    assert ids == [3, 4]
    # and the seeded reader continues from the replayed position
    batches, _ = _drive(r2, o2)
    assert [b for b in batches if b] == [[5, 6], [7, 8], [9]]


def test_clean_restart_resumes_exactly_from_progress_row():
    """Engine restart from a fully-committed mid-snapshot checkpoint
    WITH the durable progress row: the fresh reader resumes at the
    recorded keyset position — no re-planning, no backwards offsets,
    remaining rows exactly once."""
    client = _bulk_client(9)
    r1 = PostgresCDCStreamReader(_chunked_cfg(chunk=2, per_trigger=2), client=client)
    batches, offsets = _drive(r1, r1.initialOffset(), n_batches=2)
    assert [b for b in batches if b] == [[1, 2, 3, 4], [5, 6, 7, 8]]
    committed = offsets[-1]
    assert client.progress == json.dumps([["schema1", "users"], [8]])
    r2 = PostgresCDCStreamReader(_chunked_cfg(chunk=2, per_trigger=2), client=client)
    lat = r2.latestOffset()
    assert lat == {"phase": "snapshot", "table": ["schema1", "users"], "key": None}  # resumed, not replanned
    rows = [r for p in r2.partitions(committed, lat) for r in r2.read(p)]
    assert [json.loads(v)["after"]["id"] for v, _, _ in rows] == [9]
    r2.commit(lat)


def test_progress_row_cleared_once_wal_phase_advances():
    client = FakeClient()
    _drain(PostgresCDCStreamReader(PostgresCDCConfig(), client=client))
    assert client.progress is None  # wal commit cleared it
    assert client.confirmed_lsn > 0


def test_clean_restart_mid_snapshot_is_duplicate_free_without_progress():
    """The DEGRADED mode (role cannot write the progress row): the
    fresh reader re-plans from the top, the engine records one
    backwards offset served as an EMPTY batch (committed-floor clamp),
    and the remaining rows arrive exactly once — no duplicates, no
    loss."""
    client = _bulk_client(9)
    client.save_snapshot_progress = lambda pos_json: None   # writes fail silently
    client.load_snapshot_progress = lambda: None
    r1 = PostgresCDCStreamReader(_chunked_cfg(chunk=2, per_trigger=2), client=client)
    batches, offsets = _drive(r1, r1.initialOffset(), n_batches=2)
    assert [b for b in batches if b] == [[1, 2, 3, 4], [5, 6, 7, 8]]
    committed = offsets[-1]        # {"snapshot", table 0, key [8]}
    # crash + clean restart: engine calls latestOffset() FIRST
    r2 = PostgresCDCStreamReader(_chunked_cfg(chunk=2, per_trigger=2), client=client)
    lat = r2.latestOffset()        # re-planned from the top: below committed
    rows = [r for p in r2.partitions(committed, lat) for r in r2.read(p)]
    assert rows == []              # backwards span → empty, floor raised
    r2.commit(lat)
    batches2, _ = _drive(r2, lat)
    assert [i for b in batches2 for i in b] == [9]  # ONLY the tail, exactly once


def test_table_without_chunkable_pk_is_one_atomic_chunk():
    client = _bulk_client(5)
    client.snapshot[("schema1", "prefs")] = [{"k": "a", "v": 1}, {"k": "b", "v": 2}]
    # no pk registered for prefs → whole-table fallback chunk
    r = PostgresCDCStreamReader(_chunked_cfg(chunk=2, per_trigger=10), client=client)
    end = r.latestOffset()
    parts = r.partitions(r.initialOffset(), end)
    chunks = [p.chunk for p in parts]
    assert ("schema1", "prefs", [], None, None) in chunks
    assert end == {"phase": "snapshot", "table": ["schema1", "users"], "key": None}
    envs = [json.loads(v) for p in parts for v, _, _ in r.read(p)]
    assert len(envs) == 7          # 5 users + 2 prefs, exactly once
    assert {e["source"]["table"] for e in envs} == {"users", "prefs"}


def test_snapshot_chunk_options_parse():
    cfg = PostgresCDCConfig.from_options(
        {"snapshotChunkSize": "500", "snapshot_chunks_per_trigger": "3"}
    )
    assert cfg.snapshot_chunk_size == 500
    assert cfg.snapshot_chunks_per_trigger == 3


def test_reader_pickle_excludes_driver_buffers():
    """Executor pickle hygiene: the per-task reader copy must not
    carry the driver's buffered wal spans or cached chunk plans —
    read() uses only client+config (snapshot) or partition rows
    (wal)."""
    import pickle

    client = _bulk_client(9)
    r = PostgresCDCStreamReader(_chunked_cfg(chunk=3, per_trigger=2), client=client)
    end = r.latestOffset()
    parts = r.partitions(r.initialOffset(), end)
    assert r._snap_chunks            # driver keeps its plan cache...
    clone = pickle.loads(pickle.dumps(r))
    assert clone._snap_chunks == {} and clone._pending == {}
    # ...and the clone still serves an executor-side chunk read
    ids = [json.loads(v)["after"]["id"] for p in parts for v, _, _ in clone.read(p)]
    assert ids == [1, 2, 3, 4, 5, 6]


def test_restart_after_creation_real_slot_semantics_keeps_snapshot():
    """A REAL server's replication slot has a NONZERO
    confirmed_flush_lsn from the moment it is created, so slot state
    alone cannot distinguish 'crash right after slot creation' from
    'snapshot long done'. The creation-seeded progress row is the
    tie-breaker: a crash between slot creation and the FIRST
    snapshot-batch commit must re-run the snapshot on restart, not
    silently skip it (permanent data loss)."""
    client = FakeClient()
    orig_ensure = client.ensure_slot

    def ensure_with_real_semantics():
        created = orig_ensure()
        if created:
            client.confirmed_lsn = 5  # real servers: nonzero at creation
        return created

    client.ensure_slot = ensure_with_real_semantics
    r1 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    r1.latestOffset()  # slot created, progress seeded — crash before ANY commit
    assert client.progress == json.dumps([None, None])

    r2 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    rows = _drain(r2)
    envs = [json.loads(v) for v, _, _ in rows]
    assert "r" in [e["op"] for e in envs], envs  # snapshot NOT skipped
    assert envs[0]["after"]["full_name"] == "susan smith"


def test_progress_read_failure_is_not_snapshot_done():
    """Advisor-flagged loss window: ``load_snapshot_progress`` used to
    swallow every exception and return None, which the restart triage
    ("no row + advanced slot") reads as "snapshot long done" — a
    transient connection error or missing SELECT grant at a
    mid-snapshot restart silently skipped the snapshot remainder. A
    failed READ must instead resolve to the from-the-top position
    ``(None, None)`` (duplicate-free via the committed floor), with
    only genuine row ABSENCE returning None."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import (
        PostgresReplicationClient,
    )

    client = PostgresReplicationClient(PostgresCDCConfig())

    class _Boom:
        def __enter__(self):
            raise ConnectionError("server hiccup")

        def __exit__(self, *a):
            return False

    # (a) connection failure → re-plan-from-top sentinel, not None
    client._connect = lambda: _Boom().__enter__()
    assert client.load_snapshot_progress() == (None, None)

    # (b) corrupt row → same sentinel
    class _Cur:
        def execute(self, *a):
            return None

        def fetchone(self):
            return ("not json{",)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Conn:
        def cursor(self):
            return _Cur()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    client._connect = lambda: _Conn()
    assert client.load_snapshot_progress() == (None, None)

    # (c) genuine absence stays None (the "snapshot long done" signal)
    class _CurNone(_Cur):
        def fetchone(self):
            return None

    class _ConnNone(_Conn):
        def cursor(self):
            return _CurNone()

    client._connect = lambda: _ConnNone()
    assert client.load_snapshot_progress() is None


def test_triage_read_failure_resumes_snapshot_not_skip():
    """End-to-end triage: a pre-existing advanced slot whose progress
    READ fails must re-plan the snapshot (committed-floor
    duplicate-free), not mark it done."""
    client = FakeClient()
    client.slot_created = True  # pre-existing slot
    client.confirmed_lsn = 5  # looks advanced (true from creation)

    def _read_fails():
        # what the real client returns after a failed read (logged)
        return (None, None)

    client.load_snapshot_progress = _read_fails
    r = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    rows = _drain(r)
    envs = [json.loads(v) for v, _, _ in rows]
    assert "r" in [e["op"] for e in envs], envs  # snapshot NOT skipped


def test_key_exprs_pin_text_keys_to_c_collation():
    """Text key columns get the COLLATE "C" pin (server order must
    equal the driver's code-point `_key_lt` order — VERDICT r7 #1);
    integer keys stay bare (their SQL order already matches and the
    pin would be noise on the index path)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import PostgresReplicationClient

    client = PostgresReplicationClient(PostgresCDCConfig())
    client._key_types[("s", "t")] = ["bigint", "text", "character varying"]
    assert client._key_exprs("s", "t", ["a", "b", "c"]) == [
        '"a"',
        '"b" COLLATE "C"',
        '"c" COLLATE "C"',
    ]


def test_bpchar_is_not_chunkable():
    """`character` (bpchar) blank-pads comparisons ('ab' = 'ab  '
    server-side while Python orders them) — no collation pin fixes
    that, so it must fall outside the chunkable gate entirely."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import PostgresReplicationClient

    assert "character" not in PostgresReplicationClient.CHUNKABLE_TYPES
    assert "character varying" in PostgresReplicationClient.CHUNKABLE_TYPES
    assert PostgresReplicationClient.TEXT_KEY_TYPES <= PostgresReplicationClient.CHUNKABLE_TYPES


def test_parquet_wal_client_slot_semantics(tmp_path):
    """The WAL bench backend must honor the real slot contract the
    production planner relies on: peeks are non-destructive, strictly
    after the confirmed position, limit-bounded, in LSN order — and
    its records translate through the SAME wal2json_to_envelope path
    as a live server's."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import ParquetWalClient

    path = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(20)),
                "user_id": [i * 10 for i in range(20)],
                "event_type": ["view"] * 20,
            }
        ),
        path,
    )
    c = ParquetWalClient(path, "events")
    # feed: I for even ids (10), U for %10 (2), D for %14 (2: 0 and 14)
    all_recs = c.peek_changes(100)
    assert [r["action"] for r in all_recs[:3]] == ["I", "U", "D"]  # id 0: lsn 0,1,2
    assert len(all_recs) == 10 + 2 + 2
    lsns = [r["lsn_int"] for r in all_recs]
    assert lsns == sorted(lsns)
    # non-destructive + limit-bounded
    assert [r["lsn_int"] for r in c.peek_changes(3)] == lsns[:3]
    # confirmed position is a strict lower bound
    c.advance_slot(lsns[2])
    assert [r["lsn_int"] for r in c.peek_changes(100)] == lsns[3:]
    # records translate through the production envelope path
    env_i = json.loads(wal2json_to_envelope(all_recs[0], "db"))
    assert env_i["op"] == "c" and env_i["after"]["event_id"] == 0
    env_u = json.loads(wal2json_to_envelope(all_recs[1], "db"))
    assert env_u["op"] == "u" and env_u["after"]["event_type"] == "updated"
    assert env_u["before"]["event_type"] == "view"
    env_d = json.loads(wal2json_to_envelope(all_recs[2], "db"))
    assert env_d["op"] == "d" and env_d["after"] is None
    assert env_d["before"]["event_id"] == 0


def test_bench_clients_durable_state(tmp_path):
    """``state_path`` must give the parquet bench clients a real
    server's restart durability: the WAL slot's confirmed position,
    the snapshot progress row, and the created-slot marker all
    survive a NEW client instance (a restarted stream builds a fresh
    reader+client; only the state file carries over) — and the
    two-phase client's feed serves no inserts (those ride the
    snapshot), so snapshot+tail never double-deliver a row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import (
        ParquetCdcBenchClient,
        ParquetSnapshotClient,
        ParquetWalClient,
    )

    path = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(20)),
                "user_id": [i * 10 for i in range(20)],
                "event_type": ["view"] * 20,
            }
        ),
        path,
    )

    # WAL slot: confirmed survives reincarnation; peeks resume after it
    wal_state = str(tmp_path / "wal_state.json")
    w1 = ParquetWalClient(path, "events", state_path=wal_state)
    lsns = [r["lsn_int"] for r in w1.peek_changes(100)]
    w1.advance_slot(lsns[4])
    w2 = ParquetWalClient(path, "events", state_path=wal_state)
    assert w2.slot_confirmed_lsn() == lsns[4]
    assert [r["lsn_int"] for r in w2.peek_changes(100)] == lsns[5:]
    assert w2.ensure_slot() is False  # slot already exists

    # snapshot progress: created-once marker + durable keyset position
    snap_state = str(tmp_path / "snap_state.json")
    s1 = ParquetSnapshotClient(path, "events", ["event_id"], state_path=snap_state)
    assert s1.ensure_slot() is True
    s1.save_snapshot_progress(json.dumps([["parquet", "events"], [7]]))
    s2 = ParquetSnapshotClient(path, "events", ["event_id"], state_path=snap_state)
    assert s2.ensure_slot() is False  # restart, not creation
    assert s2.load_snapshot_progress() == (["parquet", "events"], [7])
    s2.clear_snapshot_progress()
    s3 = ParquetSnapshotClient(path, "events", ["event_id"], state_path=snap_state)
    assert s3.load_snapshot_progress() is None

    # two-phase client: snapshot catalog + insert-free feed + durable slot
    full_state = str(tmp_path / "full_state.json")
    f1 = ParquetCdcBenchClient(path, "events", ["event_id"], state_path=full_state)
    assert f1.list_tables() == [("parquet", "events")]
    actions = {r["action"] for r in f1.peek_changes(100)}
    assert actions == {"U", "D"}  # inserts ride the snapshot
    feed = [r["lsn_int"] for r in f1.peek_changes(100)]
    f1.advance_slot(feed[1])
    f2 = ParquetCdcBenchClient(path, "events", ["event_id"], state_path=full_state)
    assert f2.slot_confirmed_lsn() == feed[1]
    assert [r["lsn_int"] for r in f2.peek_changes(100)] == feed[2:]


def test_wal_batch_splits_into_bounded_partitions():
    """A large tail span splits into ceil(n/wal_rows_per_partition)
    tasks (parallel downstream consumption for catch-up batches) with
    every row exactly once and lsn order preserved within the span's
    concatenation."""
    client = FakeClient()
    client.change_queue = [
        [
            {
                "action": "I",
                "schema": "schema1",
                "table": "users",
                "columns": [{"name": "id", "value": 1000 + i}],
                "timestamp_ms": i,
                "lsn_int": 100 + i,
                "xid": 500,
            }
            for i in range(10)
        ],
        [],
    ]
    cfg = PostgresCDCConfig(wal_rows_per_partition=3)
    r = PostgresCDCStreamReader(cfg, client=client)
    start = r.initialOffset()
    snap_end = r.latestOffset()
    r.commit(snap_end)
    end = r.latestOffset()
    parts = r.partitions(snap_end, end)
    sizes = [len(p.rows) for p in parts]
    assert sizes == [3, 3, 3, 1]
    lsns = [lsn for p in parts for _v, lsn, _t in p.rows]
    assert lsns == sorted(lsns) and len(lsns) == 10


def test_wal_partition_option_parses():
    cfg = PostgresCDCConfig.from_options({"walRowsPerPartition": "123"})
    assert cfg.wal_rows_per_partition == 123


def test_progress_table_records_filtered_from_wal_stream():
    """The source's own bookkeeping (snapshot-progress upserts, the
    clear-on-first-advance delete) must never surface as CDC events —
    the progress table commonly lives inside a captured schema (the
    default is public) and publications cover it."""
    client = FakeClient()
    client.change_queue = [
        [
            {
                "action": "I",
                "schema": "public",
                "table": "_spark_cdc_snapshot_progress",
                "columns": [{"name": "slot_name", "value": "s"}, {"name": "pos", "value": "x"}],
                "timestamp_ms": 1,
                "lsn_int": 50,
                "xid": 1,
            },
            {
                "action": "I",
                "schema": "schema1",
                "table": "users",
                "columns": [{"name": "id", "value": 7}],
                "timestamp_ms": 2,
                "lsn_int": 51,
                "xid": 2,
            },
        ],
        [],
    ]
    r = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    rows = _drain(r)
    envs = [json.loads(v) for v, _l, _t in rows]
    tables = {e["source"]["table"] for e in envs}
    assert "_spark_cdc_snapshot_progress" not in tables
    assert any(e["op"] == "c" and e["after"] == {"id": 7} for e in envs)


def test_planning_grows_past_filtered_record_runs():
    """A run of records that translate to nothing (bookkeeping,
    Begin/Commit) wider than the peek window must not stall planning:
    the window grows until a translatable row surfaces — without the
    growth, a 2-record window full of progress upserts reads as
    'nothing new' and the real change beyond it is never planned."""
    client = FakeClient()
    fluff = [
        {
            "action": "I",
            "schema": "public",
            "table": "_spark_cdc_snapshot_progress",
            "columns": [{"name": "slot_name", "value": "s"}, {"name": "pos", "value": str(i)}],
            "timestamp_ms": i,
            "lsn_int": 30 + i,
            "xid": 1,
        }
        for i in range(6)
    ]
    real = {
        "action": "I",
        "schema": "schema1",
        "table": "users",
        "columns": [{"name": "id", "value": 42}],
        "timestamp_ms": 99,
        "lsn_int": 90,
        "xid": 2,
    }
    client.change_queue = [fluff + [real], []]
    cfg = PostgresCDCConfig(poll_batch_size=2)  # window < the fluff run
    r = PostgresCDCStreamReader(cfg, client=client)
    rows = _drain(r)
    envs = [json.loads(v) for v, _l, _t in rows]
    assert any(e["op"] == "c" and e["after"] == {"id": 42} for e in envs)
    assert all(e["source"]["table"] != "_spark_cdc_snapshot_progress" for e in envs)


def test_restart_at_snapshot_completion_plans_tail_immediately():
    """Restart landing EXACTLY at snapshot completion (round-9 find,
    caught by the sf0.001 full-registry sweep): the resumed reader's
    first latestOffset used to return the snapshot-end offset — equal
    to the last committed one — which availableNow /
    processAllAvailable reads as "caught up", stranding the whole WAL
    tail one trigger away. Snapshot-done planning with zero remaining
    chunks must fall through to wal planning in the SAME call."""
    client = FakeClient()
    r1 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    snap = r1.latestOffset()
    assert snap["phase"] == "snapshot"
    r1.commit(snap)                 # snapshot fully committed; crash here
    r2 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    off = r2.latestOffset()
    assert off["phase"] == "wal" and off["lsn"] > 1, off
    rows = [r for p in r2.partitions(snap, off) for r in r2.read(p)]
    envs = [json.loads(v) for v, _, _ in rows]
    assert [e["op"] for e in envs] == ["c"]   # first tail change served


def test_wal2json_omission_diff_property():
    """Property pin for the identity-vs-columns diff over random
    UPDATE wire shapes: for ANY column universe, any omitted subset,
    any explicit-null subset, and any identity coverage (FULL vs a
    PK prefix), the marker list is exactly (identity keys) minus
    (new-tuple keys), order-stable by identity position; explicit
    nulls are never marked; inserts and deletes never get markers;
    and the after image backfills exactly the marked keys with None
    (the pgoutput envelope shape)."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.lists(
        st.text(alphabet="abcdefgh_", min_size=1, max_size=6),
        min_size=1, max_size=6, unique=True,
    )

    @settings(max_examples=soak_examples(200), deadline=None)
    @given(
        cols=names,
        data=st.data(),
    )
    def check(cols, data):
        # identity covers a prefix (1 = PK-only .. all = FULL)
        ident_n = data.draw(st.integers(min_value=1, max_value=len(cols)))
        identity = cols[:ident_n]
        omitted = set(data.draw(st.sets(st.sampled_from(cols), max_size=len(cols) - 1)))
        explicit_null = set(
            data.draw(st.sets(st.sampled_from(cols), max_size=len(cols)))
        ) - omitted
        new_tuple = [c for c in cols if c not in omitted]
        rec = {
            "action": "U",
            "schema": "s",
            "table": "t",
            "columns": [
                {"name": c, "value": None if c in explicit_null else f"v-{c}"}
                for c in new_tuple
            ],
            "identity": [{"name": c, "value": f"old-{c}"} for c in identity],
            "timestamp_ms": 1,
            "lsn_int": 1,
        }
        env = _json.loads(wal2json_to_envelope(rec, "db"))
        expect = [c for c in identity if c in omitted]
        assert env.get("unavailable", []) == expect
        for c in cols:
            if c in expect:
                assert env["after"][c] is None  # backfilled marker shape
            elif c in omitted:
                assert c not in env["after"]  # undetectable without identity
            elif c in explicit_null:
                assert env["after"][c] is None and c not in env.get("unavailable", [])
            else:
                assert env["after"][c] == f"v-{c}"
        # inserts and deletes never diff
        ins = _json.loads(
            wal2json_to_envelope({**rec, "action": "I", "identity": None}, "db")
        )
        assert "unavailable" not in ins and ins["op"] == "c"
        dele = _json.loads(wal2json_to_envelope({**{k: v for k, v in rec.items() if k != "columns"}, "action": "D"}, "db"))
        assert "unavailable" not in dele and dele["op"] == "d" and dele["after"] is None

    check()


# -- ADVICE r11: option spellings + slot plugin diagnosis ----------------


def test_config_from_options_accepts_camelcase_spellings():
    """Spark DataSource entry paths may or may not lower-case option
    keys; every multi-word option must land under BOTH snake_case and
    camelCase. Before the fix a camelCase 'pluginName' normalized to
    'pluginname', matched nothing, and was silently dropped — which,
    with the pgoutput default, silently aimed a pgoutput reader at a
    wal2json deployment (ADVICE r11)."""
    cfg = PostgresCDCConfig.from_options(
        {
            "pluginName": "wal2json",
            "slotName": "my_slot",
            "publicationNames": "pub_a,pub_b",
            "pollBatchSize": "77",
            "schemaList": "s1, s2",
            "tableList": "users",
        }
    )
    assert cfg.plugin_name == "wal2json"
    assert cfg.slot_name == "my_slot"
    assert cfg.publication_names == "pub_a,pub_b"
    assert cfg.poll_batch_size == 77
    assert cfg.schema_list == ["s1", "s2"]
    assert cfg.table_list == ["users"]
    # snake_case spellings keep working unchanged
    snake = PostgresCDCConfig.from_options(
        {"plugin_name": "wal2json", "slot_name": "s", "publication_names": "p"}
    )
    assert (snake.plugin_name, snake.slot_name, snake.publication_names) == (
        "wal2json", "s", "p",
    )


class _SlotCursor:
    """Cursor fake for the ensure_slot conversation: answers the
    pg_replication_slots plugin probe, records every statement."""

    def __init__(self, plugin_row):
        self.plugin_row = plugin_row
        self.executed = []

    def execute(self, sql, params=None):
        self.executed.append(sql)

    def fetchone(self):
        return self.plugin_row

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _SlotConn:
    def __init__(self, cursor):
        self._cursor = cursor

    def cursor(self):
        return self._cursor

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _client_with_cursor(cursor, plugin_name="pgoutput"):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import PostgresReplicationClient

    client = PostgresReplicationClient(PostgresCDCConfig(plugin_name=plugin_name))
    client._connect = lambda: _SlotConn(cursor)
    return client


def test_ensure_slot_rejects_existing_slot_with_other_plugin():
    """A slot's output plugin is fixed at creation: a restarted
    deployment whose slot predates the pgoutput default flip must get
    a mismatch diagnosis naming both plugins and the remedies, not an
    opaque decode error from the first peek (ADVICE r11)."""
    cur = _SlotCursor(("wal2json",))
    client = _client_with_cursor(cur)
    with pytest.raises(RuntimeError) as err:
        client.ensure_slot()
    msg = str(err.value)
    assert "wal2json" in msg and "pgoutput" in msg
    assert "pg_drop_replication_slot" in msg
    # the probe ran, slot creation did NOT
    assert len(cur.executed) == 1 and "pg_replication_slots" in cur.executed[0]


def test_ensure_slot_existing_slot_with_matching_plugin_is_reused():
    cur = _SlotCursor(("pgoutput",))
    client = _client_with_cursor(cur)
    assert client.ensure_slot() is False  # reused, not created
    assert len(cur.executed) == 1


def test_ensure_slot_creates_when_absent():
    cur = _SlotCursor(None)
    client = _client_with_cursor(cur, plugin_name="wal2json")
    assert client.ensure_slot() is True
    assert any("pg_create_logical_replication_slot" in s for s in cur.executed)


def test_config_from_options_spelling_equivalence_property():
    """Property pin for the option-spelling contract (ADVICE r11):
    for ANY subset of multi-word options, the camelCase rendering of
    each key yields the exact same config as the snake_case one —
    so no entry path can silently drop a setting again."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import dataclasses

    multiword = {
        "schema_list": "sa, sb",
        "table_list": "users,orders",
        "slot_name": "slot_x",
        "plugin_name": "wal2json",
        "publication_names": "p1,p2",
        "poll_batch_size": "17",
        "snapshot_chunk_size": "123",
        "snapshot_chunks_per_trigger": "5",
        "wal_rows_per_partition": "77",
        "progress_table": "public._prog_x",
    }
    # the property's vocabulary is tied to the PRODUCTION config
    # schema (VERDICT r13 #5): a field added to the dataclass but not
    # here — or vice versa — fails loudly instead of silently
    # shrinking the property's coverage
    assert set(multiword) == {
        f.name for f in dataclasses.fields(PostgresCDCConfig) if "_" in f.name
    }

    def camel(k: str) -> str:
        head, *rest = k.split("_")
        return head + "".join(w.capitalize() for w in rest)

    @given(st.sets(st.sampled_from(sorted(multiword))))
    @settings(max_examples=soak_examples(60), deadline=None)
    def check(keys):
        snake = {k: multiword[k] for k in keys}
        camelled = {camel(k): multiword[k] for k in keys}
        assert PostgresCDCConfig.from_options(snake) == PostgresCDCConfig.from_options(camelled)

    check()


def test_config_from_options_snake_case_wins_when_both_spellings_present():
    """Documented precedence: when a caller passes BOTH spellings of
    one option, the snake_case one wins (opt() probes names in
    declaration order) — pinned so the tiebreak never silently
    flips."""
    cfg = PostgresCDCConfig.from_options(
        {"plugin_name": "wal2json", "pluginName": "pgoutput"}
    )
    assert cfg.plugin_name == "wal2json"


def test_config_from_options_rejects_unrecognized_keys():
    """A misspelled option ('plugn_name') is the same vacuous-
    misconfiguration class the camelCase fix closed — it would
    silently run with the pgoutput default against a wal2json setup.
    from_options now fails loudly, naming the offending keys and the
    known spellings (ADVICE r12)."""
    with pytest.raises(ValueError) as err:
        PostgresCDCConfig.from_options({"plugn_name": "wal2json"})
    msg = str(err.value)
    assert "plugn_name" in msg and "plugin_name" in msg
    # several unknowns are all named at once (sorted), case-folded
    # exactly like the known-spelling match is
    with pytest.raises(ValueError) as err:
        PostgresCDCConfig.from_options({"pluginNme": "x", "hostnme": "h"})
    assert "hostnme" in str(err.value) and "pluginnme" in str(err.value)


def test_config_from_options_passthrough_keys_are_not_rejected():
    """`path`/`paths` come from the DataSource read API itself
    (.load(path)), not the user's config — they must pass through the
    unknown-key gate untouched."""
    cfg = PostgresCDCConfig.from_options(
        {"path": "/tmp/out", "hostname": "h", "pluginName": "wal2json"}
    )
    assert cfg.hostname == "h" and cfg.plugin_name == "wal2json"


def test_config_from_options_unknown_key_gate_property():
    """Property pin for the unknown-key gate (ADVICE r12): ANY subset
    of known options (either spelling) + passthrough keys parses, and
    adding ANY key outside the known/passthrough sets — including
    near-misses like a trailing 's' or a dropped letter — raises a
    ValueError that names every offender. The gate can neither
    false-positive on valid configs nor silently admit a typo."""
    import dataclasses

    from hypothesis import given, settings
    from hypothesis import strategies as st

    known = {
        "hostname": "h", "port": "5433", "database": "db",
        "username": "u", "password": "pw",
        "schema_list": "s1,s2", "table_list": "t1",
        "slot_name": "sl", "plugin_name": "wal2json",
        "publication_names": "p1", "poll_batch_size": "9",
        "snapshot_chunk_size": "77", "snapshot_chunks_per_trigger": "3",
        "wal_rows_per_partition": "55", "progress_table": "public._p",
    }
    # vocabulary tied to the production schema (VERDICT r13 #5): the
    # strategy samples EVERY config field, and the spelling universe
    # it exercises is exactly from_options' own accepted set
    assert set(known) == {f.name for f in dataclasses.fields(PostgresCDCConfig)}

    def camel(k: str) -> str:
        head, *rest = k.split("_")
        return head + "".join(w.capitalize() for w in rest)

    assert (
        set(known) | {camel(k).lower() for k in known}
        == set(PostgresCDCConfig.known_option_keys())
    )

    bad_keys = st.sampled_from(
        ["plugn_name", "pluginNames", "hostnme", "slot", "tables",
         "snapshot_chunksize", "pollbatch_size", "user", "dbname"]
    )

    @given(
        st.sets(st.sampled_from(sorted(known))),
        st.booleans(),
        st.booleans(),
        st.sets(bad_keys, max_size=3),
    )
    @settings(max_examples=soak_examples(60), deadline=None)
    def check(keys, use_camel, with_path, bads):
        opts = {(camel(k) if use_camel else k): known[k] for k in keys}
        if with_path:
            opts["path"] = "/tmp/x"
        PostgresCDCConfig.from_options(dict(opts))  # valid subset parses
        if bads:
            poisoned = dict(opts)
            for b in bads:
                poisoned[b] = "x"
            with pytest.raises(ValueError) as err:
                PostgresCDCConfig.from_options(poisoned)
            for b in bads:
                assert b.lower() in str(err.value)

    check()


def test_bench_sources_strip_client_keys_before_option_gate():
    """The bench DataSources consume path/table/pk/state_path
    themselves and must strip them before the config parse — while a
    misspelled PACING option on a bench source still trips the
    unknown-key gate loudly (the same vacuous-misconfiguration class:
    'snapshotChunkSze' would otherwise silently bench the default
    chunk size)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import _bench_config

    cfg = _bench_config(
        {"path": "/tmp/x.parquet", "table": "events", "pk": "event_id",
         "state_path": "/tmp/s.json", "snapshotchunksize": "4096"}
    )
    assert cfg.snapshot_chunk_size == 4096
    with pytest.raises(ValueError, match="snapshotchunksze"):
        _bench_config({"path": "/tmp/x.parquet", "snapshotChunkSze": "4096"})


def test_known_option_keys_derived_from_config_fields():
    """The unknown-key gate's vocabulary is DERIVED from the config
    dataclass (ADVICE r13): every field name plus its lower-cased
    camelCase fold, nothing else — so a future config field is
    accepted by the gate the moment it exists, and the gate can never
    drift from the schema it guards."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(PostgresCDCConfig)}
    derived = set(PostgresCDCConfig.known_option_keys())
    assert derived == names | {n.replace("_", "") for n in names}
    # every derived spelling actually parses (no false rejections)
    for k in sorted(derived):
        cfg = PostgresCDCConfig.from_options({k: "5432" if "port" in k or "size" in k or "trigger" in k or "partition" in k or "batch" in k else "x"})
        assert isinstance(cfg, PostgresCDCConfig)


def test_bench_client_keys_accept_camelcase_spellings(tmp_path):
    """ADVICE r13: a camelCase `statePath` lower-cases to `statepath`,
    which used to slip past the client-key strip and die at the config
    gate with a message that never named the bench client keys. Both
    spellings are now stripped before the config parse AND readable by
    the clients, snake_case winning when both are present (the same
    precedence from_options documents)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import (
        _bench_config,
        _client_opt,
    )

    # the strip: a camelCase state path no longer trips the gate
    cfg = _bench_config({"path": "/tmp/x.parquet", "statepath": "/tmp/s.json"})
    assert isinstance(cfg, PostgresCDCConfig)
    # the read: both spellings resolve, snake wins on conflict
    assert _client_opt({"statepath": "/s1"}, "state_path") == "/s1"
    assert _client_opt({"state_path": "/s2"}, "state_path") == "/s2"
    assert _client_opt({"state_path": "/s2", "statepath": "/s1"}, "state_path") == "/s2"
    assert _client_opt({}, "state_path") is None


def test_bench_source_camelcase_state_path_reaches_client(tmp_path):
    """End-to-end twin of the _client_opt pin: `.option("statePath",
    ...)` on a bench DataSource lands on the CLIENT (durable slot
    state), not on the floor — previously the lower-cased key was
    invisible to the snake_case-only read and the restart scenarios
    silently ran stateless."""
    import pyspark.sql.functions as F  # noqa: F401

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import _HAS_DATASOURCE_API

    if not _HAS_DATASOURCE_API:
        pytest.skip("needs the Spark 4 Python DataSource API")
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import ParquetWalDataSource

    state = str(tmp_path / "slot_state.json")
    # Spark lower-cases DataSource option keys on some entry paths;
    # the reader lower-cases again defensively — exercise the raw
    # camelCase form exactly as .option() delivers it
    ds = ParquetWalDataSource(
        options={"path": "/tmp/events.parquet", "table": "events", "statePath": state}
    )
    reader = ds.streamReader(ds.schema())
    assert reader.client.state_path == state


def test_bench_client_key_set_is_the_spelling_fold_of_its_base_keys():
    """Drift pin for the bench client-key strip (the same class the
    derived known-set closed for the config): _CLIENT_OPTION_KEYS
    must be exactly the snake_case base keys plus their lower-cased
    camelCase folds — a future client key added in one spelling but
    not the other would silently re-open the ADVICE r13 gap."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import _CLIENT_OPTION_KEYS

    base = {"path", "table", "pk", "state_path"}
    assert set(_CLIENT_OPTION_KEYS) == base | {b.replace("_", "") for b in base}


def test_cdc_reader_offsets_model_property():
    """Model-based property over the CDC reader's offset machinery
    (pure Python, same protocol surface the example tests drive one
    scenario at a time): random snapshot sizes x chunk pacing x WAL
    batch shapes x schedules of micro-batch steps, PLAN-THEN-CRASH
    points, and clean restarts must deliver every snapshot row
    exactly once (op 'r') and every WAL change exactly once, in LSN
    order — the engine contract the per-scenario pins
    (uncommitted-span replay, mid-snapshot resume, peek-window
    growth, never-advanced-slot triage) each cover a slice of.

    Restart model mirrors MicroBatchExecution exactly: a batch is
    CONSTRUCTED (offset written to the log) only after the previous
    batch committed, so at most ONE planned-but-uncommitted offset
    exists at a crash, and a restarted engine REPLAYS it (partitions
    on the fresh reader over the committed->planned span) before
    asking for new offsets. An earlier draft of this model let a
    fresh reader plan BEFORE replaying — an engine-impossible
    history the reader rightly answers with its loud unserveable-
    range error; the fix was to the model, not the reader."""
    import dataclasses as _dc

    from hypothesis import given, settings
    from hypothesis import strategies as st

    class ScriptedClient(FakeClient):
        def __init__(self, n_snap, wal_batches):
            super().__init__()
            self.snapshot = {
                ("s1", "users"): [
                    {"id": i, "full_name": f"name {i}"} for i in range(n_snap)
                ]
            }
            self.pks = {("s1", "users"): ["id"]}
            self.change_queue = wal_batches + [[]]

    def wal_batches_strategy():
        def build(action_seq):
            batches, lsn = [], 10
            for batch_actions in action_seq:
                batch = []
                for a, key in batch_actions:
                    rec = {
                        "action": a,
                        "schema": "s1",
                        "table": "users",
                        "timestamp_ms": lsn,
                        "lsn_int": lsn,
                        "xid": lsn,
                    }
                    if a != "D":
                        rec["columns"] = [
                            {"name": "id", "value": key},
                            {"name": "full_name", "value": f"v{lsn}"},
                        ]
                    if a != "I":
                        rec["identity"] = [
                            {"name": "id", "value": key},
                            {"name": "full_name", "value": "old"},
                        ]
                    batch.append(rec)
                    lsn += 10
                batches.append(batch)
            return batches

        return st.lists(
            st.lists(
                st.tuples(st.sampled_from(["I", "U", "D"]), st.integers(0, 5)),
                min_size=0,
                max_size=3,
            ),
            min_size=0,
            max_size=3,
        ).map(build)

    ops = st.lists(
        st.sampled_from(["step", "plan_only", "restart"]),
        min_size=0,
        max_size=10,
    )

    @given(
        st.integers(0, 7),            # snapshot rows
        st.integers(1, 3),            # snapshot_chunk_size
        st.integers(1, 2),            # snapshot_chunks_per_trigger
        st.integers(1, 3),            # poll_batch_size
        wal_batches_strategy(),
        ops,
    )
    @settings(max_examples=soak_examples(40), deadline=None)
    def check(n_snap, chunk, per_trig, poll, wal_batches, schedule):
        cfg = PostgresCDCConfig(
            snapshot_chunk_size=chunk,
            snapshot_chunks_per_trigger=per_trig,
            poll_batch_size=poll,
        )
        client = ScriptedClient(n_snap, wal_batches)
        reader = PostgresCDCStreamReader(cfg, client=client)
        delivered = []
        committed = json.loads(json.dumps(reader.initialOffset()))
        planned = []  # uncommitted tail of the offset log, in plan order

        def serve(rd, start, end):
            rows = [r for p in rd.partitions(start, end) for r in rd.read(p)]
            delivered.extend(rows)
            rd.commit(end)

        def replay(rd):
            # the engine re-runs the constructed-but-uncommitted batch
            # from its offset log before planning anything new
            nonlocal committed
            while planned:
                nxt = planned.pop(0)
                serve(rd, committed, nxt)
                committed = nxt

        def step(rd):
            nonlocal committed
            replay(rd)
            end = json.loads(json.dumps(rd.latestOffset()))
            if end != committed:
                serve(rd, committed, end)
                committed = end

        for op in schedule:
            if op == "step":
                step(reader)
            elif op == "plan_only":
                # construct one batch (offset hits the log), then the
                # driver dies before running/committing it — legal
                # only with nothing else outstanding, so replay first
                replay(reader)
                end = json.loads(json.dumps(reader.latestOffset()))
                if end != committed:
                    planned.append(end)
            elif op == "restart":
                reader = PostgresCDCStreamReader(cfg, client=client)
        # final catch-up: the scripted slot surfaces one queued batch
        # per peek (real slot semantics), so a single no-advance step
        # does not mean drained — run enough unconditional steps to
        # exhaust every queued batch, snapshot chunk, and replay
        n_changes = sum(len(b) for b in wal_batches)
        for _ in range(8 + len(wal_batches) + n_snap + n_changes):
            step(reader)
        envs = [json.loads(v) for v, _, _ in delivered]
        snap = sorted(e["after"]["id"] for e in envs if e["op"] == "r")
        assert snap == list(range(n_snap)), (snap, n_snap)
        tail = [(e["op"], e["source"]["lsn"]) for e in envs if e["op"] != "r"]
        want = [
            ({"I": "c", "U": "u", "D": "d"}[r["action"]], r["lsn_int"])
            for b in wal_batches
            for r in b
        ]
        assert tail == want, (tail, want)

    check()

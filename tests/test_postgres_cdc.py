"""Postgres CDC source tests with a fake replication client (no
server in this container): snapshot→WAL handoff, offset bookkeeping,
wal2json→Debezium translation, and end-to-end compatibility with the
engine's parse/compact pipeline."""

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

    def ensure_slot(self):
        created = not self.slot_created
        self.slot_created = True
        return created

    def list_tables(self):
        return sorted(self.snapshot)

    def snapshot_rows(self, schema, table):
        yield from self.snapshot[(schema, table)]

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
    assert reader._pending == {} or all(k == (0, 1) for k in reader._pending)


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
    r1.latestOffset()              # snapshot planned
    r1.commit({"phase": "wal", "lsn": 1})
    end = r1.latestOffset()        # wal batch with lsn=10 planned, NOT committed
    assert end == {"phase": "wal", "lsn": 11}
    # crash: new reader, same server state (slot exists, confirmed=0)
    r2 = PostgresCDCStreamReader(PostgresCDCConfig(), client=client)
    [part] = r2.partitions({"phase": "wal", "lsn": 1}, {"phase": "wal", "lsn": 11})
    envs = [json.loads(v) for v, _, _ in part.rows]
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
    assert (0, 1) not in r2._pending          # no re-snapshot planned
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
    r1.latestOffset()
    r1.commit({"phase": "wal", "lsn": 1})
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
    r.latestOffset()
    r.commit({"phase": "wal", "lsn": 1})
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


def test_config_from_options_parses_lists():
    cfg = PostgresCDCConfig.from_options(
        {"schema_list": "schema1, schema2", "table_list": "users", "port": "5434"}
    )
    assert cfg.schema_list == ["schema1", "schema2"]
    assert cfg.table_list == ["users"]
    assert cfg.port == 5434

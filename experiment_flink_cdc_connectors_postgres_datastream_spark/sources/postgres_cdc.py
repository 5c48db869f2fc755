"""Postgres CDC streaming source (S1) on the Spark 4 Python DataSource
API: initial snapshot (op='r') then logical-replication tail, emitting
Debezium-format JSON envelopes compatible with ``cdc.parse_cdc``.

Reference parity (StreamingJobWithCustomDeserializer.java:64-78 source
builder): hostname/port/database/username/password/schema-allowlist/
slot name/decoding plugin are the same knobs. Two decoding plugins:
``wal2json`` (format-version 2 — one JSON object per change, textual)
and ``pgoutput`` — the reference's own plugin (SJCD:67) and the one
managed Postgres offerings universally ship — decoded by
:mod:`.pgoutput` into the same record shape (requires a publication,
``publication_names``). Both need the same server config
(``wal_level=logical``, docker-compose.yaml:10; ``REPLICA IDENTITY
FULL`` for before-images, setup_source_db1.sql:11,17).

Offsets: ``{"phase": "snapshot"}`` → ``{"phase": "wal", "lsn": N}``;
the snapshot and the slot tail hand off without loss because the slot
is created *before* the snapshot reads (changes during the snapshot
are replayed from the slot; last-write-wins compaction downstream
dedupes). LSN offsets live in the streaming checkpoint, giving
exactly-once source progress like the reference's checkpointed
Debezium engine (StreamingJob.java:36-39).

Failure semantics: polling uses ``pg_logical_slot_peek_changes``
(non-destructive) and the slot is advanced only in ``commit()`` —
i.e. only after Spark has durably checkpointed the batch's end
offset. Until then every planned-but-uncommitted change remains in
the slot, so ``partitions()`` can re-serve any checkpointed span by
re-peeking after a driver restart (with a doubling window, so spans
beyond the first ``poll_batch_size`` changes are still reachable); a
fresh reader detects a restart by the slot existing AND having been
advanced at least once (confirmed_lsn > 0 proves a batch committed)
and seeds its LSN watermark from the confirmed position instead of
re-running the snapshot — a never-advanced slot is treated as a fresh
start, because its snapshot may not have reached the offset log. A
wal-phase span that cannot be recovered from the slot raises rather
than silently returning an empty batch.

psycopg2 is not in this container: all DB access goes through an
injectable connector factory so the offset/translation logic is fully
unit-tested with a fake; ``register`` fails fast with a clear error if
the driver is missing at runtime.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

try:
    from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    DataSource = object  # type: ignore[assignment]
    DataSourceStreamReader = object  # type: ignore[assignment]
    InputPartition = object  # type: ignore[assignment]
    _HAS_DATASOURCE_API = False

from pyspark.sql.types import LongType, StringType, StructField, StructType

_warned_fallback = False


def _warn_pg_minimal_fallback() -> None:
    """One warning per process when the pure-Python client substitutes
    for psycopg2: the fallback renders %s params client-side (string
    quoting), which an operator should know is the live code path."""
    global _warned_fallback
    if not _warned_fallback:
        import logging  # noqa: PLC0415

        logging.getLogger(__name__).warning(
            "psycopg2 not importable; using the bundled pure-Python "
            "pg_minimal client (client-side param rendering, simple-query "
            "protocol). Install psycopg2 for production deployments."
        )
        _warned_fallback = True


#: raw-record schema: Debezium JSON + stream position (the S2 string
#: stage; `cdc.parse_cdc` is the S3 typed stage)
RAW_CDC_SCHEMA = StructType(
    [
        StructField("value", StringType()),
        StructField("lsn", LongType()),
        StructField("ts_ms", LongType()),
    ]
)


@dataclass
class PostgresCDCConfig:
    hostname: str = "localhost"
    port: int = 5432
    database: str = "experiment"
    username: str = "postgres"
    password: str = ""
    schema_list: list[str] = field(default_factory=lambda: ["public"])
    table_list: list[str] = field(default_factory=list)  # empty = all
    slot_name: str = "experiment_flink_cdc_connectors_postgres_datastream_spark_slot"
    plugin_name: str = "wal2json"
    publication_names: str = "experiment_flink_cdc_connectors_postgres_datastream_spark_pub"
    poll_batch_size: int = 1000

    @classmethod
    def from_options(cls, options: dict[str, str]) -> "PostgresCDCConfig":
        def split(v: str) -> list[str]:
            return [s.strip() for s in v.split(",") if s.strip()]

        return cls(
            hostname=options.get("hostname", "localhost"),
            port=int(options.get("port", "5432")),
            database=options.get("database", "experiment"),
            username=options.get("username", "postgres"),
            password=options.get("password", ""),
            schema_list=split(options.get("schema_list", "public")),
            table_list=split(options.get("table_list", "")),
            slot_name=options.get("slot_name", cls.slot_name),
            plugin_name=options.get("plugin_name", "wal2json"),
            publication_names=options.get("publication_names", cls.publication_names),
            poll_batch_size=int(options.get("poll_batch_size", "1000")),
        )


def wal2json_to_envelope(change: dict[str, Any], database: str) -> str | None:
    """Translate one wal2json (format-version 2) change record into a
    Debezium-style envelope JSON string. Returns None for records that
    carry no row change (BEGIN/COMMIT/TRUNCATE/message)."""
    action = change.get("action")
    ops = {"I": "c", "U": "u", "D": "d"}
    if action not in ops:
        return None

    def row_of(cols: list[dict[str, Any]] | None) -> dict[str, Any] | None:
        if cols is None:
            return None
        return {c["name"]: c["value"] for c in cols}

    after = row_of(change.get("columns"))
    before = row_of(change.get("identity"))
    ts_ms = change.get("timestamp_ms", 0)
    lsn = change.get("lsn_int", 0)
    envelope = {
        "before": before,
        "after": after,
        "source": {
            "version": "wal2json-2",
            "connector": "postgresql",
            "name": "experiment_flink_cdc_connectors_postgres_datastream_spark",
            "ts_ms": ts_ms,
            "db": database,
            "schema": change.get("schema"),
            "table": change.get("table"),
            "txId": change.get("xid", 0),
            "lsn": lsn,
        },
        "op": ops[action],
        "ts_ms": ts_ms,
    }
    return json.dumps(envelope)


def snapshot_row_to_envelope(
    schema: str, table: str, row: dict[str, Any], database: str, ts_ms: int = 0
) -> str:
    """Render one snapshot row as an op='r' envelope
    (the Debezium snapshot phase, StreamingJobWithCustomDeserializer.java:129-133)."""
    return json.dumps(
        {
            "before": None,
            "after": row,
            "source": {
                "version": "snapshot",
                "connector": "postgresql",
                "name": "experiment_flink_cdc_connectors_postgres_datastream_spark",
                "ts_ms": ts_ms,
                "db": database,
                "schema": schema,
                "table": table,
                "txId": 0,
                "lsn": 0,
            },
            "op": "r",
            "ts_ms": ts_ms,
        }
    )


class PostgresReplicationClient:
    """Thin DB access layer (separable for tests). Real implementation
    uses psycopg2; every method returns plain Python data."""

    def __init__(self, config: PostgresCDCConfig):
        self.config = config

    def _connect(self):
        try:
            import psycopg2 as driver  # noqa: PLC0415
        except ImportError:  # pragma: no cover - env without driver
            # pure-Python protocol-v3 fallback (same call surface);
            # lets the live integration test run where psycopg2 can't
            # be installed — see sources/pg_minimal.py for scope. Loud
            # on first use: a production deployment missing psycopg2
            # should not switch drivers silently.
            from experiment_flink_cdc_connectors_postgres_datastream_spark.sources import pg_minimal as driver  # noqa: PLC0415

            _warn_pg_minimal_fallback()
        c = self.config
        return driver.connect(
            host=c.hostname, port=c.port, dbname=c.database, user=c.username, password=c.password
        )

    def ensure_slot(self) -> bool:  # pragma: no cover - needs server
        """Create the replication slot if absent. Returns True if this
        call created it (fresh start), False if it already existed
        (restart of a previous incarnation)."""
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT 1 FROM pg_replication_slots WHERE slot_name = %s",
                (self.config.slot_name,),
            )
            if cur.fetchone() is not None:
                return False
            cur.execute(
                "SELECT pg_create_logical_replication_slot(%s, %s)",
                (self.config.slot_name, self.config.plugin_name),
            )
            return True

    def slot_confirmed_lsn(self) -> int:  # pragma: no cover - needs server
        """The slot's confirmed_flush position as an int LSN (0 if the
        slot has never been advanced)."""
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT confirmed_flush_lsn FROM pg_replication_slots WHERE slot_name = %s",
                (self.config.slot_name,),
            )
            row = cur.fetchone()
            if row is None or row[0] is None:
                return 0
            hi, lo = str(row[0]).split("/")
            return (int(hi, 16) << 32) | int(lo, 16)

    def advance_slot(self, lsn_int: int) -> None:  # pragma: no cover - needs server
        """Move the slot's confirmed position up to ``lsn_int`` —
        called only after the batch covering it is checkpointed."""
        if lsn_int <= 0:
            return
        lsn_txt = f"{lsn_int >> 32:X}/{lsn_int & 0xFFFFFFFF:X}"
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT pg_replication_slot_advance(%s, %s)",
                (self.config.slot_name, lsn_txt),
            )

    def list_tables(self) -> list[tuple[str, str]]:  # pragma: no cover - needs server
        c = self.config
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT table_schema, table_name FROM information_schema.tables "
                "WHERE table_schema = ANY(%s) AND table_type = 'BASE TABLE'",
                (c.schema_list,),
            )
            tables = [(s, t) for s, t in cur.fetchall()]
        if c.table_list:
            tables = [(s, t) for s, t in tables if t in c.table_list]
        return tables

    def snapshot_rows(self, schema: str, table: str) -> Iterator[dict[str, Any]]:  # pragma: no cover
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(f'SELECT * FROM "{schema}"."{table}"')
            cols = [d[0] for d in cur.description]
            for row in cur:
                yield dict(zip(cols, row))

    def peek_changes(self, limit: int) -> list[dict[str, Any]]:  # pragma: no cover - needs server
        """Read up to ``limit`` changes from the slot WITHOUT consuming
        them. The slot position moves only via ``advance_slot`` after
        checkpoint, so an uncommitted batch is always re-readable.
        Each record dict gets ``lsn_int`` injected.

        Plugin dispatch: ``wal2json`` peeks text-mode JSON (format
        version 2); ``pgoutput`` — the reference's own plugin, and the
        only one most managed Postgres offerings ship — peeks binary
        messages and decodes them with :class:`~.pgoutput
        .PgOutputDecoder` into the SAME record shape, so everything
        downstream is plugin-agnostic. pgoutput requires a publication
        (``publication_names``) covering the captured tables."""
        if self.config.plugin_name == "pgoutput":
            return self._peek_pgoutput(limit)
        out: list[dict[str, Any]] = []
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT lsn, xid, data FROM pg_logical_slot_peek_changes(%s, NULL, %s, "
                "'format-version', '2', 'include-timestamp', '1', 'include-lsn', '1')",
                (self.config.slot_name, limit),
            )
            for lsn, xid, data in cur.fetchall():
                rec = json.loads(data)
                hi, lo = lsn.split("/")
                rec["lsn_int"] = (int(hi, 16) << 32) | int(lo, 16)
                rec.setdefault("xid", xid)
                out.append(rec)
        return out

    def _peek_pgoutput(self, limit: int) -> list[dict[str, Any]]:  # pragma: no cover - needs server
        """Binary peek + stateful decode. A fresh decoder per peek is
        correct AND required: every peek restarts from the slot's
        confirmed position, so the Relation registrations at the head
        of the window are re-read each time."""
        from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.pgoutput import PgOutputDecoder

        decoder = PgOutputDecoder()
        out: list[dict[str, Any]] = []
        with self._connect() as conn, conn.cursor() as cur:
            cur.execute(
                "SELECT lsn, xid, data FROM pg_logical_slot_peek_binary_changes(%s, NULL, %s, "
                "'proto_version', '1', 'publication_names', %s)",
                (self.config.slot_name, limit, self.config.publication_names),
            )
            for lsn, _xid, data in cur.fetchall():
                hi, lo = lsn.split("/")
                rec = decoder.decode((int(hi, 16) << 32) | int(lo, 16), bytes(data))
                if rec is not None:
                    out.append(rec)
        return out


class PostgresCDCPartition(InputPartition):
    def __init__(self, rows: list[tuple]):
        self.rows = rows


class PostgresCDCStreamReader(DataSourceStreamReader):
    """Streaming reader: snapshot phase then WAL tail, LSN offsets.

    The planning happens on the driver (``latestOffset`` polls and
    buffers); partitions ship the buffered rows to executors. Suits
    CDC volumes (a changelog tail is driver-bounded by nature —
    Debezium does the same single-threaded read in the reference)."""

    def __init__(self, config: PostgresCDCConfig, client: PostgresReplicationClient | None = None):
        self.config = config
        self.client = client or PostgresReplicationClient(config)
        self._pending: dict[tuple[int, int], list[tuple]] = {}
        self._snapshot_done = False
        self._last_lsn = 0  # planned (not necessarily committed) watermark

    def initialOffset(self) -> dict:
        return {"phase": "snapshot", "lsn": 0}

    def _changes_to_rows(self, changes: list[dict[str, Any]], floor_lsn: int) -> list[tuple]:
        """Translate peeked wal2json records into (envelope, lsn, ts)
        rows, dropping non-row actions and anything at/below
        ``floor_lsn`` (already planned into an earlier span — peek
        re-returns unadvanced changes on every call)."""
        rows: list[tuple] = []
        for rec in changes:
            lsn = rec.get("lsn_int", 0)
            if lsn < floor_lsn:
                continue
            env = wal2json_to_envelope(rec, self.config.database)
            if env is not None:
                rows.append((env, lsn, rec.get("timestamp_ms", 0)))
        return rows

    def _peek_covering(self, span_end: int) -> list[dict[str, Any]]:
        """Peek from the slot with a doubling window until the view
        covers ``span_end`` or the slot is exhausted. Exhaustion is
        detected by the LSN horizon no longer advancing when the window
        grows — NOT by ``len(changes) < limit``, which under-counts for
        pgoutput (Begin/Relation/Commit messages consume window slots
        but decode to no row change). Peeks are non-destructive, so
        re-reading a growing prefix costs only the re-decode."""
        limit = self.config.poll_batch_size
        prev_max = -1
        while True:
            changes = self.client.peek_changes(limit)
            if not changes:
                return changes
            max_lsn = max(c.get("lsn_int", 0) for c in changes)
            if max_lsn + 1 >= span_end or max_lsn <= prev_max:
                return changes
            prev_max = max_lsn
            limit *= 2

    def _snapshot_rows(self) -> list[tuple]:
        rows: list[tuple] = []
        for schema, table in self.client.list_tables():
            for row in self.client.snapshot_rows(schema, table):
                rows.append(
                    (snapshot_row_to_envelope(schema, table, row, self.config.database), 0, 0)
                )
        return rows

    def latestOffset(self) -> dict:
        if not self._snapshot_done:
            # Slot first: no gap between snapshot and tail. A
            # pre-existing slot *usually* means a previous incarnation
            # snapshotted — but only a slot that has been ADVANCED
            # proves a batch ever committed (advance happens strictly
            # after checkpoint, and only for post-snapshot batches).
            # confirmed_lsn==0 therefore means the previous incarnation
            # died before any WAL batch committed: its snapshot may
            # never have reached Spark's offset log, and seeding the
            # watermark here would plan the first span as (0, max_lsn+1)
            # — which partitions() serves with WAL rows only, silently
            # dropping every snapshot row. Treat it as a fresh start and
            # re-run the snapshot; if the snapshot batch *did* commit,
            # Spark never asks for span (0,1) again and the extra read
            # is discarded (op='r' rows are idempotent under downstream
            # last-write-wins compaction in any case).
            created = self.client.ensure_slot()
            if created or self.client.slot_confirmed_lsn() == 0:
                self._pending[(0, 1)] = self._snapshot_rows()
                self._snapshot_done = True
                self._last_lsn = 1
                return {"phase": "wal", "lsn": 1}
            self._snapshot_done = True
            self._last_lsn = self.client.slot_confirmed_lsn() + 1
        # Grow the peek window past already-planned-but-uncommitted
        # changes (they stay in the slot until commit advances it) —
        # a fixed-size peek would re-see only the oldest uncommitted
        # span and stall planning until a commit.
        changes = self._peek_covering(self._last_lsn + 1)
        rows = self._changes_to_rows(changes, self._last_lsn)
        if rows:
            max_lsn = max(lsn for _, lsn, _ in rows)
            self._pending[(self._last_lsn, max_lsn + 1)] = rows
            self._last_lsn = max_lsn + 1
        return {"phase": "wal", "lsn": self._last_lsn}

    def partitions(self, start: dict, end: dict) -> list[PostgresCDCPartition]:
        span = (start.get("lsn", 0), end.get("lsn", 0))
        # A wal-phase start means the snapshot batch is behind us —
        # keep internal state consistent on a restarted reader so the
        # next latestOffset() continues instead of re-snapshotting.
        if span[1] >= 1:
            self._snapshot_done = True
            self._last_lsn = max(self._last_lsn, span[1])
        rows = self._pending.get(span)
        if rows is None and span == (0, 1):
            # Snapshot batch replay after restart: re-read the tables.
            # op='r' envelopes are idempotent under downstream
            # last-write-wins compaction.
            rows = self._snapshot_rows()
        if rows is None:
            # Restart replay of a planned-but-uncommitted wal batch:
            # the slot was not advanced past it, so re-peek and filter
            # to the requested range. Peek windows grow until they
            # cover the span's end — with several uncommitted spans in
            # flight at crash time (commit lag, multi-batch triggers),
            # later spans lie beyond the first poll_batch_size changes
            # and a single fixed-size peek would falsely conclude the
            # slot cannot serve them.
            changes = self._peek_covering(span[1])
            rows = [
                r
                for r in self._changes_to_rows(changes, span[0])
                if span[0] <= r[1] < span[1]
            ]
            if not rows and span[1] > span[0] > 0:
                raise RuntimeError(
                    f"postgres_cdc: cannot serve checkpointed offset range "
                    f"[{span[0]}, {span[1]}) from slot "
                    f"{self.config.slot_name!r}: the slot has no changes in "
                    "range (was it advanced or recreated externally?). "
                    "Refusing to return an empty batch for a non-empty span."
                )
        return [PostgresCDCPartition(rows or [])]

    def read(self, partition: PostgresCDCPartition) -> Iterator[tuple]:
        yield from partition.rows

    def commit(self, end: dict) -> None:
        """Called after Spark durably commits ``end`` to the offset
        log: only now is it safe to drop driver buffers and advance
        the replication slot past the batch."""
        end_lsn = end.get("lsn", 0)
        for k in [k for k in self._pending if k[1] <= end_lsn]:
            del self._pending[k]
        if end_lsn > 1:
            # end_lsn is max committed change lsn + 1; advance the slot
            # to the last committed change itself.
            self.client.advance_slot(end_lsn - 1)


if _HAS_DATASOURCE_API:

    class PostgresCDCDataSource(DataSource):
        """`spark.readStream.format("postgres_cdc")` entry point."""

        @classmethod
        def name(cls) -> str:
            return "postgres_cdc"

        def schema(self) -> StructType:
            return RAW_CDC_SCHEMA

        def streamReader(self, schema: StructType) -> PostgresCDCStreamReader:
            return PostgresCDCStreamReader(PostgresCDCConfig.from_options(dict(self.options)))

    def register(spark) -> None:
        """Register the source on a session:
        ``spark.readStream.format("postgres_cdc").options(...)``."""
        spark.dataSource.register(PostgresCDCDataSource)

    def register_cdc_table(spark, name: str, **options: str) -> None:
        """Catalog DDL registration — the reference's
        ``executeSql("CREATE TABLE … WITH (connector=…)")`` surface
        (StreamingJobWithCustomDeserializer.java:156-174): after this,
        ``spark.readStream.table(name)`` (or the same from SQL tooling)
        tails the CDC stream, and the table definition survives in the
        catalog like any other ``USING``-provider table.

        Identifiers are validated and option values escaped before
        being rendered into the DDL string."""
        if not all(part.replace("_", "").isalnum() for part in name.split(".")):
            raise ValueError(f"invalid table identifier: {name!r}")
        register(spark)
        opts = ""
        if options:
            rendered = ", ".join(
                f"{k} '{str(v).replace(chr(39), chr(39) * 2)}'" for k, v in sorted(options.items())
            )
            opts = f" OPTIONS ({rendered})"
        spark.sql(f"CREATE TABLE IF NOT EXISTS {name} USING postgres_cdc{opts}")

else:  # pragma: no cover

    def register(spark) -> None:
        raise ImportError("postgres_cdc source requires the Spark 4 Python DataSource API")

    def register_cdc_table(spark, name: str, **options: str) -> None:
        raise ImportError("postgres_cdc source requires the Spark 4 Python DataSource API")

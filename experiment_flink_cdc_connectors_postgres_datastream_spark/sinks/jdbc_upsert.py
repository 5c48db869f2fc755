"""JDBC upsert sink (K3): continuously upsert aggregate rows into a
PK-keyed Postgres table — the reference's
`INSERT INTO user_count_by_pgschema … GROUP BY schema` flow
(StreamingJobWithCustomDeserializer.java:183-194; DDL
setup_sink_db1.sql:1-4), where the Flink JDBC connector turns INSERT
into upsert because the table declares a PRIMARY KEY.

Spark's JDBC writer has no upsert mode, so we execute
``INSERT … ON CONFLICT (pk) DO UPDATE`` per partition (executor-side
connections, like the reference's sink tasks). Idempotent upserts turn
at-least-once ``foreachBatch`` delivery into effective exactly-once.

The DB driver is psycopg2 when importable, otherwise the bundled
pure-Python protocol client (``sources.pg_minimal``) — the same
fallback the CDC source's ``PostgresReplicationClient`` uses, so the
live integration test exercises the production write path either way.
``ParquetUpsertSink`` is the same interface over parquet for tests
and local runs without any server.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession


def _connect(dsn: str):
    """psycopg2 when available, else the bundled protocol client (loud
    on first use — same policy as PostgresReplicationClient._connect)."""
    try:
        import psycopg2 as driver  # noqa: PLC0415
    except ImportError:  # pragma: no cover - env without driver
        from experiment_flink_cdc_connectors_postgres_datastream_spark.sources import pg_minimal as driver  # noqa: PLC0415
        from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import (  # noqa: PLC0415
            _warn_pg_minimal_fallback,
        )

        _warn_pg_minimal_fallback()
    return driver.connect(dsn)


def build_upsert_sql(table: str, columns: list[str], key_cols: list[str]) -> str:
    """Render the Postgres upsert statement for one row (%s params)."""
    collist = ", ".join(columns)
    params = ", ".join(["%s"] * len(columns))
    keylist = ", ".join(key_cols)
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in key_cols)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({params}) "
        f"ON CONFLICT ({keylist}) DO UPDATE SET {updates}"
    )


def build_delete_stale_sql(table: str, key_cols: list[str], n_keep: int) -> str:
    """DELETE every row whose key is NOT among the ``n_keep`` kept key
    tuples (%s params, row-constructor comparison). ``n_keep == 0``
    truncates: an empty full-state batch means the table is empty.

    Null-safe by construction: ``NOT IN`` would evaluate to NULL for
    EVERY row as soon as one kept tuple contains a NULL (deleting
    nothing — the exact stale-group bug refresh mode exists to
    prevent), so the predicate is an AND-chain of row-constructor
    ``IS DISTINCT FROM`` comparisons instead."""
    if n_keep == 0:
        return f"DELETE FROM {table}"
    keylist = ", ".join(key_cols)
    tup = "(" + ", ".join(["%s"] * len(key_cols)) + ")"
    preds = " AND ".join([f"({keylist}) IS DISTINCT FROM {tup}"] * n_keep)
    return f"DELETE FROM {table} WHERE {preds}"


#: staged-keys temp table name — TEMP is session-scoped and the sink
#: opens a fresh connection per refresh batch, so it vanishes with the
#: connection. (NOT ``ON COMMIT DROP``: the pg_minimal fallback driver
#: autocommits per statement, which would drop the table between the
#: CTAS and the inserts.)
STAGE_TABLE = "_graft_kept_keys"


def build_stage_keys_ddl(table: str, key_cols: list[str]) -> str:
    """CREATE the kept-keys staging temp table with the TARGET's own
    key column types (CTAS off an always-false predicate) — no type
    mapping to maintain."""
    keylist = ", ".join(key_cols)
    return (
        f"CREATE TEMP TABLE {STAGE_TABLE} AS "
        f"SELECT {keylist} FROM {table} WHERE FALSE"
    )


def build_delete_unstaged_sql(table: str, key_cols: list[str]) -> str:
    """DELETE rows whose key tuple is absent from the staged kept-key
    table — the O(1)-statement-size form of :func:`build_delete_stale_sql`
    for high-cardinality aggregates. Null-safe: row-constructor
    ``IS NOT DISTINCT FROM`` matches NULL key components, so a kept
    NULL-bearing tuple protects its row (``NOT IN`` / plain ``=``
    would not)."""
    t_tup = "(" + ", ".join(f"t.{c}" for c in key_cols) + ")"
    s_tup = "(" + ", ".join(f"s.{c}" for c in key_cols) + ")"
    return (
        f"DELETE FROM {table} t WHERE NOT EXISTS "
        f"(SELECT 1 FROM {STAGE_TABLE} s WHERE {s_tup} IS NOT DISTINCT FROM {t_tup})"
    )


class JdbcUpsertSink:
    """foreachBatch-compatible upsert writer: one connection per
    partition, batched executemany.

    ``refresh=True`` treats every batch as the COMPLETE table (the
    shape ``run_compacted_aggregate`` produces — it recomputes the
    aggregate over full live state each micro-batch): after the
    partition upserts, keys absent from the batch are DELETED, so a
    group whose live count transiently drops to zero cannot leave a
    stale row behind (same contract as
    ``ParquetUpsertSink(refresh=True)``). The key collect is bounded
    by GROUP CARDINALITY (the aggregate's output size), not data size
    — the only reason a driver-side collect is admissible here.

    The delete itself is size-gated (``stage_threshold``): up to the
    threshold it is ONE statement of row-constructor ``IS DISTINCT
    FROM`` predicates; above it, that statement would be O(groups) SQL
    text the server re-parses every micro-batch (megabytes at ~10⁵
    groups), so the kept keys are staged into a temp table (CTAS takes
    the target's own column types, batched inserts) and stale rows go
    via one constant-size ``NOT EXISTS`` anti-join DELETE — the same
    gate-by-size pattern as the calibration persist."""

    def __init__(self, dsn: str, table: str, key_cols: list[str],
                 batch_size: int = 1000, refresh: bool = False,
                 stage_threshold: int = 5000):
        self.dsn = dsn
        self.table = table
        self.key_cols = key_cols
        self.batch_size = batch_size
        self.refresh = refresh
        self.stage_threshold = stage_threshold

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        columns = df.columns
        sql = build_upsert_sql(self.table, columns, self.key_cols)
        dsn, batch_size = self.dsn, self.batch_size

        def write_partition(rows: Iterator[Row]) -> None:
            conn = _connect(dsn)
            try:
                with conn, conn.cursor() as cur:
                    buf = []
                    for row in rows:
                        buf.append(tuple(row[c] for c in columns))
                        if len(buf) >= batch_size:
                            cur.executemany(sql, buf)
                            buf = []
                    if buf:
                        cur.executemany(sql, buf)
            finally:
                conn.close()

        if not self.refresh:
            df.foreachPartition(write_partition)
            return
        # refresh: persist so the upsert pass and the kept-keys collect
        # see the SAME batch content, then drop stale keys
        df = df.persist()
        try:
            df.foreachPartition(write_partition)
            keys = [
                tuple(r[c] for c in self.key_cols)
                for r in df.select(*self.key_cols).distinct().collect()
            ]
        finally:
            df.unpersist()
        conn = _connect(dsn)
        try:
            with conn, conn.cursor() as cur:
                if len(keys) > self.stage_threshold:
                    cur.execute(build_stage_keys_ddl(self.table, self.key_cols))
                    ins = (
                        f"INSERT INTO {STAGE_TABLE} VALUES "
                        f"({', '.join(['%s'] * len(self.key_cols))})"
                    )
                    for i in range(0, len(keys), batch_size):
                        cur.executemany(ins, keys[i : i + batch_size])
                    cur.execute(build_delete_unstaged_sql(self.table, self.key_cols))
                else:
                    cur.execute(
                        build_delete_stale_sql(self.table, self.key_cols, len(keys)),
                        [v for k in keys for v in k] or None,
                    )
        finally:
            conn.close()

    def read_rows(self) -> list[tuple]:
        """Driver-side readback of the sink table, sorted (the
        test/verification surface — the DataFrame analog of
        ``ParquetUpsertSink.read``). NULL-safe sort: None is not
        orderable against str/int in Python, so nulls sort first
        per column."""
        conn = _connect(self.dsn)
        try:
            with conn.cursor() as cur:
                cur.execute(f"SELECT * FROM {self.table}")
                return sorted(
                    cur.fetchall(),
                    key=lambda r: tuple((v is not None, v) for v in r),
                )
        finally:
            conn.close()


class ParquetUpsertSink:
    """Same contract against a parquet directory (tests / local runs):
    merge-by-key, last write wins.

    Durability/determinism (vs the naive overwrite-in-place version):

    - state lives in a :class:`GenerationalStateStore` — each batch
      rewrites only the key-hash buckets it touches and publishes via
      an atomic manifest rename, so a crash mid-write can never
      destroy previously-committed rows;
    - within a batch, duplicate keys are resolved by ``seq_cols``
      (highest wins); without ``seq_cols`` the last occurrence *within
      each partition* wins (``monotonically_increasing_id`` orders rows
      per-partition only, so across partitions the winner follows
      partition layout, not global input order — supply ``seq_cols``
      when cross-partition determinism matters);
    - ``refresh=True`` treats every batch as the COMPLETE table (the
      shape :func:`run_compacted_aggregate` produces — it recomputes
      the aggregate over full live state each micro-batch): keys
      absent from the batch are DELETED, so a group whose live count
      transiently drops to zero cannot leave a stale row behind. The
      commit rewrites all buckets, which is fine precisely because a
      full-state aggregate is group-cardinality-sized, not data-sized.
    """

    def __init__(self, path: str, key_cols: list[str], seq_cols: list[str] | None = None,
                 n_buckets: int = 8, refresh: bool = False,
                 bucket_cols: list[str] | None = None):
        self.path = path
        self.key_cols = key_cols
        self.seq_cols = seq_cols or []
        self.n_buckets = n_buckets
        self.refresh = refresh
        # optional key-prefix bucketing (see GenerationalStateStore):
        # co-locates all rows of an entity so entity-scoped reads can
        # prune to their buckets
        self.bucket_cols = bucket_cols
        self._store = None

    def _get_store(self, spark: SparkSession):
        from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming.statestore import GenerationalStateStore

        if self._store is None:
            self._store = GenerationalStateStore(
                spark, self.path, self.key_cols, n_buckets=self.n_buckets,
                bucket_cols=self.bucket_cols,
            )
        return self._store

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import compact_latest
        from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming.statestore import BUCKET_COL

        spark = df.sparkSession
        store = self._get_store(spark)
        # _gen separates old state (0) from this batch (1); _row_seq
        # makes the within-batch winner deterministic when seq_cols
        # don't fully order duplicates (last occurrence wins).
        batch = store.with_bucket(
            df.withColumn("_gen", F.lit(1)).withColumn(
                "_row_seq", F.monotonically_increasing_id()
            )
        )
        if self.refresh:
            # batch IS the whole table: dedupe within it, then rewrite
            # every bucket so absent keys (empty groups) are deleted
            compacted = compact_latest(
                batch, self.key_cols, ["_gen", *self.seq_cols, "_row_seq"]
            ).drop("_gen", "_row_seq")
            store.commit(compacted, list(range(store.n_buckets)), version=batch_id)
            return
        touched = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
        if not touched:
            return
        full = store.gen_count() >= store.max_generations
        prev = store.read(buckets=None if full else touched)
        merged = batch
        if prev is not None:
            merged = prev.withColumn("_gen", F.lit(0)).withColumn(
                "_row_seq", F.lit(0).cast("long")
            ).unionByName(batch)
        # compacted still carries _bucket (part of the payload)
        compacted = compact_latest(
            merged, self.key_cols, ["_gen", *self.seq_cols, "_row_seq"]
        ).drop("_gen", "_row_seq")
        store.commit(
            compacted,
            list(range(store.n_buckets)) if full else touched,
            version=batch_id,
        )

    def touched_buckets(self, df: DataFrame) -> list[int]:
        """Bucket ids the given rows map to, computed with the STORE's
        manifest-honored bucket_cols / n_buckets (the constructor
        values are overridden by an existing store's manifest — using
        them directly would prune the wrong buckets on reopen).
        Bounded collect: at most n_buckets ints."""
        from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming.statestore import BUCKET_COL

        store = self._get_store(df.sparkSession)
        return [
            r[0]
            for r in store.with_bucket(df).select(BUCKET_COL).distinct().collect()
        ]

    def read(self, spark: SparkSession, buckets: list[int] | None = None) -> DataFrame:
        """Committed state; with ``buckets``, a partition-pruned read of
        just those bucket ids (pair with ``bucket_cols`` so an
        entity-scoped consumer never scans the full table).

        An EMPTIED table (e.g. a refresh batch whose groups all
        vanished — the store records empty-bucket manifest markers for
        it, r15) reads back as a typed zero-row DataFrame;
        FileNotFoundError means nothing was ever committed."""
        state = self._get_store(spark).read(buckets=buckets)
        if state is None:
            raise FileNotFoundError(f"ParquetUpsertSink: no committed state at {self.path}")
        from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming.statestore import BUCKET_COL

        return state.drop(BUCKET_COL)

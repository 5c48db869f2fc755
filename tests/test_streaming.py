"""Streaming tests: file-based CDC stream → compaction/aggregation →
sinks, asserting stream-batch consistency on the golden walkthrough
(SURVEY.md §5 'streaming tests')."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc import parse_cdc, project_flat, with_key
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.reference_surface import USERS_ROW_SCHEMA
from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks import ParquetUpsertSink, route_foreach_batch
from experiment_flink_cdc_connectors_postgres_datastream_spark.sources import read_cdc_file_stream
from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming import (
    run_compacted_aggregate,
    stream_compact_latest,
)
from tests.golden_cdc import (
    EXPECTED_COUNTS_AFTER_DELETE,
    WITH_SNAPSHOT_AND_DELETE,
)


@pytest.fixture()
def cdc_dir(tmp_path):
    """Golden events split across two files (two micro-batches with
    maxFilesPerTrigger=1)."""
    d = tmp_path / "cdc"
    d.mkdir()
    half = len(WITH_SNAPSHOT_AND_DELETE) // 2
    (d / "part1.json").write_text("\n".join(WITH_SNAPSHOT_AND_DELETE[:half]) + "\n")
    (d / "part2.json").write_text("\n".join(WITH_SNAPSHOT_AND_DELETE[half:]) + "\n")
    return str(d)


def _flat_users(stream):
    parsed = parse_cdc(stream, USERS_ROW_SCHEMA)
    return with_key(project_flat(parsed, "users", ["id", "full_name"]), "schema", "id")


def test_foreachbatch_compacted_aggregate_matches_batch(spark, cdc_dir, tmp_path):
    stream = read_cdc_file_stream(spark, cdc_dir, max_files_per_trigger=1)
    flat = _flat_users(stream)
    sink = ParquetUpsertSink(str(tmp_path / "sink.parquet"), key_cols=["schema"])
    q = run_compacted_aggregate(
        flat,
        state_dir=str(tmp_path / "state"),
        key_cols=["key"],
        seq_cols=["ts_ms", "lsn"],
        group_cols=["schema"],
        op_col="op",
        sink=sink,
        query_name="test_agg",
    )
    q.processAllAvailable()
    q.stop()
    result = {r["schema"]: r["user_count"] for r in sink.read(spark).collect()}
    assert result == EXPECTED_COUNTS_AFTER_DELETE


def test_stream_compact_latest_state_updates(spark, cdc_dir):
    stream = read_cdc_file_stream(spark, cdc_dir, max_files_per_trigger=1)
    flat = _flat_users(stream).select("key", "op", "schema", "ts_ms", "lsn", "full_name")
    compacted = stream_compact_latest(flat, ["key"], ["ts_ms", "lsn"], op_col="op")
    q = (
        compacted.writeStream.format("memory")
        .queryName("compacted_mem")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM compacted_mem").collect()
    # final state per key = last emitted row for that key
    final: dict[str, tuple] = {}
    for r in rows:
        final[r["key"]] = (r["full_name"], r["_live"])
    assert final["schema1|1"] == ("sue smith", True)
    assert final["schema2|1"] == ("bobby smith", True)
    assert final["schema1|2"][1] is False          # tombstoned
    assert final["schema3|7"] == ("snap shot", True)  # snapshot row live


def test_route_foreach_batch_single_pass_multi_sink(spark, cdc_dir, tmp_path):
    stream = read_cdc_file_stream(spark, cdc_dir)
    parsed = parse_cdc(stream, USERS_ROW_SCHEMA)
    users_path = str(tmp_path / "users_sink")
    raw_path = str(tmp_path / "raw_sink")

    def parquet_append(path):
        def write(df, batch_id):
            df.write.mode("append").parquet(path)

        return write

    q = route_foreach_batch(
        parsed,
        routes={
            "users": (
                lambda b: project_flat(b, "users", ["id", "full_name"]),
                parquet_append(users_path),
            ),
            "raw_ops": (lambda b: b.select("op"), parquet_append(raw_path)),
        },
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(users_path).count() == len(WITH_SNAPSHOT_AND_DELETE)
    assert spark.read.parquet(raw_path).count() == len(WITH_SNAPSHOT_AND_DELETE)


def test_streaming_tumbling_window(spark, tmp_path):
    """A2: tumbling event-time window with watermark over a file stream."""
    d = tmp_path / "events"
    d.mkdir()
    rows = [
        '{"word": "a", "ts": "2024-01-01T00:00:01"}',
        '{"word": "a", "ts": "2024-01-01T00:00:03"}',
        '{"word": "b", "ts": "2024-01-01T00:00:07"}',
        '{"word": "a", "ts": "2024-01-01T00:00:08"}',
    ]
    (d / "events.json").write_text("\n".join(rows))
    stream = (
        spark.readStream.schema("word string, ts timestamp").json(str(d))
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds"), F.col("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = stream.writeStream.format("memory").queryName("win_mem").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window"]["start"].second, r["word"]): r["cnt"]
        for r in spark.sql("SELECT * FROM win_mem").collect()
    }
    assert got == {(0, "a"): 2, (5, "b"): 1, (5, "a"): 1}

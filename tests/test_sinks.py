"""Sink tests: bus wire projection (K2) and JDBC upsert SQL (K3)."""

from __future__ import annotations

import json

from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks import ParquetUpsertSink, build_upsert_sql
from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks.bus import to_keyed_json


def test_to_keyed_json_wire_shape(spark):
    df = spark.createDataFrame(
        [("schema1|1", "c", 1, "susan")], "key string, op string, id long, full_name string"
    )
    out = to_keyed_json(df, topic="users", value_cols=["op", "id", "full_name"])
    assert out.columns == ["key", "value", "topic"]
    row = out.collect()[0]
    assert bytes(row["key"]) == b"schema1|1"
    assert json.loads(bytes(row["value"])) == {"op": "c", "id": 1, "full_name": "susan"}
    assert row["topic"] == "users"


def test_build_upsert_sql():
    sql = build_upsert_sql("user_count_by_pgschema", ["pgschema", "user_count"], ["pgschema"])
    assert sql == (
        "INSERT INTO user_count_by_pgschema (pgschema, user_count) VALUES (%s, %s) "
        "ON CONFLICT (pgschema) DO UPDATE SET user_count = EXCLUDED.user_count"
    )


def test_parquet_upsert_sink_merges_by_key(spark, tmp_path):
    sink = ParquetUpsertSink(str(tmp_path / "t.parquet"), key_cols=["k"])
    sink(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long"), 0)
    sink(spark.createDataFrame([("b", 9), ("c", 3)], "k string, v long"), 1)
    got = {r["k"]: r["v"] for r in sink.read(spark).collect()}
    assert got == {"a": 1, "b": 9, "c": 3}


def test_parquet_upsert_sink_within_batch_winner_by_seq_cols(spark, tmp_path):
    """A key appearing twice in ONE batch resolves by seq_cols, not by
    arbitrary max_by tie-breaking."""
    sink = ParquetUpsertSink(str(tmp_path / "t.parquet"), key_cols=["k"], seq_cols=["ts"])
    sink(
        spark.createDataFrame(
            [("a", 5, "late"), ("a", 9, "latest"), ("a", 1, "early")],
            "k string, ts long, v string",
        ),
        0,
    )
    [row] = sink.read(spark).collect()
    assert (row["k"], row["ts"], row["v"]) == ("a", 9, "latest")
    # and a later batch with a lower seq still wins (upsert = last batch
    # wins regardless of seq, matching ON CONFLICT DO UPDATE semantics)
    sink(spark.createDataFrame([("a", 2, "newer-batch")], "k string, ts long, v string"), 1)
    [row] = sink.read(spark).collect()
    assert row["v"] == "newer-batch"


def test_parquet_upsert_sink_without_seq_cols_last_occurrence_wins(spark, tmp_path):
    sink = ParquetUpsertSink(str(tmp_path / "t.parquet"), key_cols=["k"])
    df = spark.createDataFrame([("a", 1), ("a", 2), ("a", 3)], "k string, v long").coalesce(1)
    sink(df, 0)
    [row] = sink.read(spark).collect()
    assert row["v"] == 3

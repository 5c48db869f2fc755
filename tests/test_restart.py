"""Exactly-once restart test: kill the compacted-aggregate query,
restart from its checkpoint, feed more data — no double counting,
state intact (the reference's checkpoint/savepoint story,
StreamingJob.java:36-39, automated)."""

from __future__ import annotations

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc import parse_cdc, project_flat, with_key
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.reference_surface import USERS_ROW_SCHEMA
from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks import ParquetUpsertSink
from experiment_flink_cdc_connectors_postgres_datastream_spark.sources import read_cdc_file_stream
from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming import run_compacted_aggregate
from tests.golden_cdc import WALKTHROUGH, _env


def _start(spark, cdc_dir, tmp_path, sink):
    stream = read_cdc_file_stream(spark, cdc_dir, max_files_per_trigger=1)
    flat = with_key(
        project_flat(parse_cdc(stream, USERS_ROW_SCHEMA), "users", ["id", "full_name"]),
        "schema",
        "id",
    )
    return run_compacted_aggregate(
        flat,
        state_dir=str(tmp_path / "state"),
        key_cols=["key"],
        seq_cols=["ts_ms", "lsn"],
        group_cols=["schema"],
        op_col="op",
        sink=sink,
        query_name="restart_agg",
    )


def test_restart_refresh_sink_deletes_emptied_group(spark, tmp_path):
    """Refresh-mode sink across a restart: a group whose last live key
    is deleted AFTER the restart must vanish from the sink (no stale
    row), and replayed batches stay idempotent (refresh rewrites all
    buckets, so a replay of the same aggregate is a no-op)."""
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    (cdc_dir / "b1.json").write_text("\n".join(WALKTHROUGH))
    sink = ParquetUpsertSink(
        str(tmp_path / "sink.parquet"), key_cols=["schema"], refresh=True
    )

    q1 = _start(spark, str(cdc_dir), tmp_path, sink)
    q1.processAllAvailable()
    q1.stop()
    counts1 = {r["schema"]: r["user_count"] for r in sink.read(spark).collect()}
    assert counts1 == {"schema1": 2, "schema2": 1}

    # restart; delete schema2's only live user → the group empties
    (cdc_dir / "b2.json").write_text(_env("d", "schema2", 1, None, "bobby smith", 9000, 9))
    q2 = _start(spark, str(cdc_dir), tmp_path, sink)
    q2.processAllAvailable()
    q2.stop()
    counts2 = {r["schema"]: r["user_count"] for r in sink.read(spark).collect()}
    assert counts2 == {"schema1": 2}, counts2


def test_restart_from_checkpoint_no_double_count(spark, tmp_path):
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    (cdc_dir / "b1.json").write_text("\n".join(WALKTHROUGH))
    sink = ParquetUpsertSink(str(tmp_path / "sink.parquet"), key_cols=["schema"])

    q1 = _start(spark, str(cdc_dir), tmp_path, sink)
    q1.processAllAvailable()
    q1.stop()
    counts1 = {r["schema"]: r["user_count"] for r in sink.read(spark).collect()}
    assert counts1 == {"schema1": 2, "schema2": 1}

    # restart from the same checkpoint; add one new insert + one update
    (cdc_dir / "b2.json").write_text(
        _env("c", "schema2", 5, "new person", None, 7000, 7)
        + "\n"
        + _env("u", "schema1", 1, "sue smith II", "sue smith", 8000, 8)
    )
    q2 = _start(spark, str(cdc_dir), tmp_path, sink)
    q2.processAllAvailable()
    q2.stop()
    counts2 = {r["schema"]: r["user_count"] for r in sink.read(spark).collect()}
    # update must not double count; only the insert changes a count
    assert counts2 == {"schema1": 2, "schema2": 2}


def test_scd2_streamed_restart_converges_to_batch(spark, tmp_path):
    """Incremental SCD2 maintenance across a kill/restart: process one
    out-of-order slice, stop the query, restart from the same
    checkpoint with the remaining slices — the upsert-by-(key,event)
    sink makes batch replay idempotent, and the final table must
    equal the batch-recomputed history exactly (same law the graded
    `cdc_scd2_streamed` query pins, here with a crash in the middle)."""
    import pyspark.sql.functions as F

    from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import scd2_history
    from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks import ParquetUpsertSink

    raw_cols = ["user_id", "event_id", "ts", "event_type", "value"]
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(*raw_cols)
    src = str(tmp_path / "src")
    sink = ParquetUpsertSink(
        str(tmp_path / "sink"),
        key_cols=["user_id", "event_id"],
        bucket_cols=["user_id"],
    )
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"

    def maintain(batch_df, batch_id):
        sp = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["user_id", "event_id"])
        affected = batch.select("user_id").distinct()
        touched = sink.touched_buckets(affected)
        try:
            prev = sink.read(sp, buckets=touched)
        except FileNotFoundError:
            prev = None
        merged = batch
        if prev is not None and prev.columns:
            prior = prev.join(affected, "user_id").select(*raw_cols)
            merged = prior.unionByName(batch).dropDuplicates(["user_id", "event_id"])
        sink(scd2_history(merged, ["user_id"], ["ts", "event_id"]), batch_id)

    def run():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(maintain)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    # slice 0 only, then kill
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.mode("append").parquet(src)
    q = run()
    q.processAllAvailable()
    q.stop()
    # remaining out-of-order slices arrive after the restart
    for r in (1, 2):
        ev.filter(F.col("event_id") % 3 == r).coalesce(1).write.mode("append").parquet(src)
    q = run()
    q.processAllAvailable()
    q.stop()

    got = sink.read(spark).select(
        "user_id", "event_id",
        F.unix_micros("valid_from").alias("f"),
        F.unix_micros("valid_to").alias("t"),
        "is_current",
    )
    want = scd2_history(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id",
        F.unix_micros("valid_from").alias("f"),
        F.unix_micros("valid_to").alias("t"),
        "is_current",
    )
    assert got.count() == ev.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

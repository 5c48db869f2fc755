"""S4 tests: upsert table over a Kafka-shaped bus changelog with
metadata columns, batch and streaming.

Graded-row pin index (tests/test_plans.py's batch-plan sweep): this
module pins the engine behavior behind `bus_roundtrip_streamed` (the
bus_upsert spool source — name-range offsets, replay, truncation
guard, rate limiting, restart seeding, the unknown-option gate) and
`dedup_within_watermark_streamed` (watermarked streaming dedup on
the upsert key)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import changelog_from_bus, upsert_view

from soakopt import soak_examples

VALUE_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("full_name", StringType())]
)


def _bus_frame(spark):
    """Kafka wire shape: key/value binary + topic/timestamp/offset."""
    rows = [
        (b"schema1|1", b'{"id": 1, "full_name": "susan"}', "users", dt.datetime(2024, 1, 1), 1),
        (b"schema1|2", b'{"id": 2, "full_name": "anne"}', "users", dt.datetime(2024, 1, 2), 2),
        (b"schema1|1", b'{"id": 1, "full_name": "sue"}', "users", dt.datetime(2024, 1, 3), 3),
    ]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, timestamp timestamp, offset long"
    )


def test_changelog_surfaces_metadata_columns(spark):
    cl = changelog_from_bus(_bus_frame(spark), VALUE_SCHEMA)
    assert set(cl.columns) == {"key", "id", "full_name", "topic", "event_time", "sequence_id"}
    first = cl.orderBy("sequence_id").first()
    assert first["key"] == "schema1|1" and first["full_name"] == "susan"
    assert first["topic"] == "users" and first["sequence_id"] == 1


def test_upsert_view_latest_per_primary_key(spark):
    cl = changelog_from_bus(_bus_frame(spark), VALUE_SCHEMA)
    view = {r["key"]: r["full_name"] for r in upsert_view(cl).collect()}
    assert view == {"schema1|1": "sue", "schema1|2": "anne"}


def test_streaming_dropduplicates_within_watermark(spark, tmp_path):
    """Streaming exact dedup (at-least-once bus → effectively-once):
    dropDuplicates on the upsert key within a watermark."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.json").write_text(
        '{"key": "k1", "ts": "2024-01-01T00:00:01"}\n'
        '{"key": "k1", "ts": "2024-01-01T00:00:01"}\n'
        '{"key": "k2", "ts": "2024-01-01T00:00:02"}\n'
    )
    stream = (
        spark.readStream.schema("key string, ts timestamp").json(str(d))
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["key", "ts"])
    )
    q = stream.writeStream.format("memory").queryName("dedup_mem").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(1) c FROM dedup_mem").first()["c"] == 2


def test_bus_spool_source_replay_and_truncation_guard(spark, tmp_path):
    """The streaming source contract: (a) readStream delivers exactly
    the spooled frames with assigned sequence offsets; (b) a
    checkpointed span (start,end) re-serves the identical files
    (restart replay); (c) a truncated spool refuses a partial replay
    instead of silently returning fewer frames."""
    import pytest as _pytest

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        BusUpsertStreamReader,
        register_bus_source,
        spool_frames,
    )

    spool = str(tmp_path / "spool")
    df1 = spark.createDataFrame(
        [("k1", '{"a":1}', "t"), ("k2", '{"a":2}', "t")], "key string, value string, topic string"
    )
    df2 = spark.createDataFrame([("k1", '{"a":3}', "t")], "key string, value string, topic string")
    spool_frames(df1.coalesce(1), spool, seq=0)
    spool_frames(df2.coalesce(1), spool, seq=1)

    # (a) end-to-end through readStream
    register_bus_source(spark)
    stream = spark.readStream.format("bus_upsert").option("path", spool).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("bus_spool_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["key"], r["value"]) for r in spark.table("bus_spool_t").collect()}
    assert got == {("k1", '{"a":1}'), ("k2", '{"a":2}'), ("k1", '{"a":3}')}
    offs = sorted(r["offset"] for r in spark.table("bus_spool_t").collect())
    assert offs == [0, 1, 1 << 32]  # file_index << 32 | line

    # (b) replay of the first span returns exactly file 0's frames
    reader = BusUpsertStreamReader(spool)
    parts = reader.partitions({"last": "", "n": 0}, {"last": "frames-00000000-0000.jsonl", "n": 1})
    replay = [row for p in parts for row in reader.read(p)]
    assert {(r[0], r[1]) for r in replay} == {("k1", '{"a":1}'), ("k2", '{"a":2}')}

    # (c) truncation: checkpoint expects 2 files, spool has fewer
    import os as _os

    for n in _os.listdir(spool):
        if n.startswith("frames-00000001"):
            _os.remove(_os.path.join(spool, n))
    with _pytest.raises(RuntimeError, match="truncated"):
        reader.partitions({"last": "", "n": 0}, {"last": "frames-00000001-0000.jsonl", "n": 2})


def test_bus_spool_source_restart_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: stop the query, publish more
    frames, restart from the SAME checkpoint — the second incarnation
    must deliver only the new files (no replay of committed spans,
    no gaps)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        register_bus_source,
        spool_frames,
    )

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "key string, value string, topic string"
    register_bus_source(spark)

    spool_frames(
        spark.createDataFrame([("k1", "v1", "t"), ("k2", "v2", "t")], schema).coalesce(1),
        spool,
        seq=0,
    )

    def run_once():
        # file sink: the one built-in sink with real checkpoint
        # recovery (memory sink refuses to restart from a checkpoint)
        stream = spark.readStream.format("bus_upsert").option("path", spool).load()
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    got_a = {(r["key"], r["value"]) for r in spark.read.parquet(out).collect()}
    assert got_a == {("k1", "v1"), ("k2", "v2")}

    spool_frames(
        spark.createDataFrame([("k3", "v3", "t")], schema).coalesce(1), spool, seq=1
    )
    # second incarnation, SAME checkpoint: output must grow by exactly
    # the new frame — a committed-span replay would duplicate k1/k2
    run_once()
    got_b = sorted((r["key"], r["value"]) for r in spark.read.parquet(out).collect())
    assert got_b == [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], (
        f"committed span replayed or dropped: {got_b}"
    )


def test_bus_spool_rate_limit_and_restart_seed(spark, tmp_path):
    """maxFilesPerTrigger paces a deep spool into bounded micro-
    batches (cold start: offsets advance 1,2,3), and a restarted
    reader re-seeds its pacing watermark from the checkpointed span
    instead of re-pacing from zero; a transiently backwards span is
    an empty batch, not an error."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        BusUpsertStreamReader,
        spool_frames,
    )

    spool = str(tmp_path / "spool")
    schema = "key string, value string, topic string"
    for i in range(3):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )

    def _off(o):  # offsets also carry the reader-incarnation "ep" stamp
        return {k: v for k, v in o.items() if k != "ep"}

    r = BusUpsertStreamReader(spool, max_files_per_trigger=1)
    assert _off(r.initialOffset()) == {"last": "", "n": 0}  # fresh start: baseline, pacing on
    assert _off(r.latestOffset()) == {"last": "frames-00000000-0000.jsonl", "n": 1}
    assert _off(r.latestOffset()) == {"last": "frames-00000001-0000.jsonl", "n": 2}
    assert _off(r.latestOffset()) == {"last": "frames-00000002-0000.jsonl", "n": 3}
    assert _off(r.latestOffset()) == {"last": "frames-00000002-0000.jsonl", "n": 3}  # caught up

    # uncommitted-replay restart: partitions() seeds the watermark
    r2 = BusUpsertStreamReader(spool, max_files_per_trigger=1)
    rows = [row for p in r2.partitions({"last": "", "n": 0}, {"last": "frames-00000001-0000.jsonl", "n": 2}) for row in r2.read(p)]
    assert [x[0] for x in rows] == ["k0", "k1"]
    assert _off(r2.latestOffset()) == {"last": "frames-00000002-0000.jsonl", "n": 3}  # resumes from the seed, not zero

    # clean restart from a fully-committed checkpoint: the engine
    # calls latestOffset FIRST — it must NOT cap below the committed
    # position (that would regress the offset log and re-deliver
    # committed files), so the un-seeded first call is uncapped
    r3 = BusUpsertStreamReader(spool, max_files_per_trigger=1)
    assert _off(r3.latestOffset()) == {"last": "frames-00000002-0000.jsonl", "n": 3}

    # backwards span (defensive) is an empty batch, not an error
    r4 = BusUpsertStreamReader(spool, max_files_per_trigger=1)
    assert [
        row
        for p in r4.partitions({"last": "frames-00000001-0000.jsonl", "n": 2}, {"last": "frames-00000000-0000.jsonl", "n": 1})
        for row in r4.read(p)
    ] == []
    assert _off(r4.latestOffset()) == {"last": "frames-00000002-0000.jsonl", "n": 3}


def test_bus_spool_rate_limited_committed_restart_no_duplicates(spark, tmp_path):
    """The review scenario end-to-end: maxFilesPerTrigger=1, process
    and COMMIT the whole spool, stop cleanly, publish one more file,
    restart from the same checkpoint — every frame must appear exactly
    once (a pacing watermark capping below the committed offset would
    re-deliver the committed files)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        register_bus_source,
        spool_frames,
    )

    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "key string, value string, topic string"
    register_bus_source(spark)
    for i in range(2):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )

    def run_once():
        stream = (
            spark.readStream.format("bus_upsert")
            .option("path", spool)
            .option("maxFilesPerTrigger", "1")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(r["key"] for r in spark.read.parquet(out).collect()) == ["k0", "k1"]
    spool_frames(spark.createDataFrame([("k2", "v2", "t")], schema).coalesce(1), spool, seq=2)
    run_once()
    got = sorted(r["key"] for r in spark.read.parquet(out).collect())
    assert got == ["k0", "k1", "k2"], f"duplicate or dropped delivery: {got}"


def test_bus_spool_batch_sql_name_registration(spark, tmp_path):
    """The topic under a SQL NAME: register_bus_table binds a temp
    view over the batch read (NOT catalog DDL — that path cannot
    forward options to Python data sources in this Spark version, see
    the register_bus_table docstring) — the reference's upsert-pulsar
    executeSql surface re-expressed. The same changelog ->
    upsert_view pipeline then runs over the named table."""
    import uuid as _uuid

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        register_bus_table,
        spool_frames,
    )

    spool = str(tmp_path / "spool")
    schema = "key string, value string, topic string"
    spool_frames(
        spark.createDataFrame(
            [("k1", '{"id": 1, "full_name": "susan"}', "users"),
             ("k1", '{"id": 1, "full_name": "sue"}', "users"),
             ("k2", '{"id": 2, "full_name": "anne"}', "users")],
            schema,
        ).coalesce(1),
        spool,
        seq=0,
    )
    tbl = f"bus_tbl_{_uuid.uuid4().hex[:8]}"
    try:
        register_bus_table(spark, tbl, spool)
        frames = spark.table(tbl)
        assert frames.count() == 3
        cl = changelog_from_bus(frames, VALUE_SCHEMA)
        view = {r["key"]: r["full_name"] for r in upsert_view(cl).collect()}
        assert view == {"k1": "sue", "k2": "anne"}
        # plain SQL over the registered name works too
        n = spark.sql(f"SELECT COUNT(1) AS n FROM {tbl} WHERE key = 'k1'").first()["n"]
        assert n == 2
    finally:
        spark.catalog.dropTempView(tbl)


def test_bus_spool_name_offsets_catch_retention_and_rogue_publish(spark, tmp_path):
    """Round-7 offset hardening: offsets are file NAMES + counts, so
    (a) deleting a committed PREFIX file makes its replay a loud
    count-mismatch error (positional offsets would silently serve the
    WRONG files), while spans before the deletion still replay
    correctly by name; (b) a rogue lower-seq publish landing inside a
    committed range is likewise loud."""
    import pytest as _pytest

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        BusUpsertStreamReader,
        spool_frames,
    )

    spool = str(tmp_path / "spool")
    schema = "key string, value string, topic string"
    for i in (0, 2, 3):  # seq 1 deliberately absent for (b)
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )
    f = [f"frames-0000000{i}-0000.jsonl" for i in range(4)]
    r = BusUpsertStreamReader(spool)

    # (a) retention deletes the middle committed file
    os.remove(os.path.join(spool, f[2]))
    with _pytest.raises(RuntimeError, match="truncated or a non-sequential"):
        r.partitions({"last": f[0], "n": 1}, {"last": f[2], "n": 2})
    # the span BEFORE the deletion still replays exactly, by name
    rows = [row for p in r.partitions({"last": "", "n": 0}, {"last": f[0], "n": 1}) for row in r.read(p)]
    assert [x[0] for x in rows] == ["k0"]

    # (b) a rogue producer publishes seq 1 into an already-planned range
    spool_frames(spark.createDataFrame([("rogue", "vx", "t")], schema).coalesce(1), spool, seq=1)
    with _pytest.raises(RuntimeError, match="truncated or a non-sequential"):
        r.partitions({"last": "", "n": 0}, {"last": f[3], "n": 2})


def test_bus_spool_retention_plus_publish_not_skipped(spark, tmp_path):
    """Retention deletion of COMMITTED prefix files while new files
    land in the same planning interval: a count-of-listing watermark
    reads the shrunken listing as 'nothing new' and silently skips the
    new files; the name-based watermark must deliver them. The fresh
    reader's first latestOffset after the deletion undercounts n (it
    cannot know the historical total), so partitions() must serve the
    forward-by-name span rather than misreading e_n <= s_n as
    backwards."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        BusUpsertStreamReader,
        spool_frames,
    )

    spool = str(tmp_path / "spool_ret")
    schema = "key string, value string, topic string"
    for i in range(3):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )
    f = [f"frames-0000000{i}-0000.jsonl" for i in range(5)]
    committed = {"last": f[2], "n": 3}  # f0..f2 planned and committed

    # retention drops the committed prefix; two new files arrive
    os.remove(os.path.join(spool, f[0]))
    os.remove(os.path.join(spool, f[1]))
    for i in (3, 4):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )

    # clean restart: latestOffset fires first on a fresh reader
    r = BusUpsertStreamReader(spool)
    latest = r.latestOffset()
    assert latest["last"] == f[4]  # the advance is by NAME, not listing size
    rows = [
        row for p in r.partitions(committed, latest) for row in r.read(p)
    ]
    assert [x[0] for x in rows] == ["k3", "k4"]  # new files delivered exactly


def test_bus_spool_partial_retention_rebased_count_not_truncation(spark, tmp_path):
    """Round-8 regression (advisor-reproduced crash loop): retention
    deletes FEWER committed prefix files than new files arrive in the
    same interval. The fresh reader's first latestOffset rebases n on
    the shrunken listing (committed n=3 at f2; delete f0; publish
    f3,f4 → fresh n counts 4 files, so e_n - s_n = 1 while the span
    (f2,f4] matches 2 files by name). The old strict count equality
    raised 'spool was truncated' for a span that is exactly right by
    name and the stream crash-looped permanently; counts from
    different reader incarnations (different offset "ep") must not be
    compared — names are the authority."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        BusUpsertStreamReader,
        spool_frames,
    )

    spool = str(tmp_path / "spool_partial_ret")
    schema = "key string, value string, topic string"
    for i in range(3):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )
    f = [f"frames-0000000{i}-0000.jsonl" for i in range(5)]

    # the committed offset carries the FIRST incarnation's epoch
    r0 = BusUpsertStreamReader(spool)
    committed = r0.latestOffset()
    assert (committed["last"], committed["n"]) == (f[2], 3)

    # retention deletes ONE committed prefix file; TWO new files land
    os.remove(os.path.join(spool, f[0]))
    for i in (3, 4):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )

    # clean restart: fresh reader, latestOffset fires first and
    # rebases its count on the 4-file listing (e_n=4, e_n-s_n=1,
    # span len 2) — must serve the by-name span, not crash
    r = BusUpsertStreamReader(spool)
    latest = r.latestOffset()
    assert latest["last"] == f[4]
    rows = [row for p in r.partitions(committed, latest) for row in r.read(p)]
    assert [x[0] for x in rows] == ["k3", "k4"]

    # same-incarnation spans keep the strict cross-check: both
    # offsets from ONE reader, then delete a file inside the span —
    # replaying it must stay loud
    import pytest as _pytest

    f5, f6 = "frames-00000005-0000.jsonl", "frames-00000006-0000.jsonl"
    o1 = latest
    for i in (5, 6):
        spool_frames(
            spark.createDataFrame([(f"k{i}", f"v{i}", "t")], schema).coalesce(1), spool, seq=i
        )
    o2 = r.latestOffset()
    assert (o2["last"], o2["ep"]) == (f6, o1["ep"])
    os.remove(os.path.join(spool, f5))
    with _pytest.raises(RuntimeError, match="truncated or a non-sequential"):
        r.partitions(o1, o2)


def test_bus_source_rejects_unrecognized_option_keys(spark, tmp_path):
    """The unknown-option-key gate, extended from postgres_cdc to the
    bus source (VERDICT r13 #3): a typo'd pacing key used to run the
    stream silently UNPACED, and a misspelled path key silently read
    an empty spool. Both DataSource halves now fail loudly, naming
    the offenders and the known options."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        _validated_options,
        register_bus_source,
        spool_frames,
    )

    # unit level: both case-foldings of a typo are named
    with pytest.raises(ValueError) as err:
        _validated_options({"path": "/tmp/x", "maxFilesPerTrigge": "1"})
    assert "maxfilespertrigge" in str(err.value) and "maxFilesPerTrigger" in str(err.value)
    with pytest.raises(ValueError, match="pth"):
        _validated_options({"pth": "/tmp/x"})
    # end-to-end: the gate fires through the real read paths, batch
    # and streaming, against a live spool
    spool = str(tmp_path / "spool")
    frames = spark.createDataFrame([("k1", '{"v": 1}')], "key string, value string")
    spool_frames(frames, spool, seq=0)
    register_bus_source(spark)
    with pytest.raises(Exception, match="unrecognized option"):
        spark.read.format("bus_upsert").option("path", spool).option(
            "maxFilesPerTrigge", "1"
        ).load().collect()
    with pytest.raises(Exception, match="unrecognized option"):
        (
            spark.readStream.format("bus_upsert")
            .option("path", spool)
            .option("startingOffsets", "earliest")  # a Kafka option, not ours
            .load()
            .writeStream.format("memory")
            .queryName("bus_gate_reject")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
            .processAllAvailable()
        )


def test_bus_source_known_options_pass_the_gate(spark, tmp_path):
    """Gate complement: `path` + `maxFilesPerTrigger` (either
    spelling) parse on both halves — the batch half documents the
    pacing knob as a no-op, same contract as Spark's file source."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        _validated_options,
        register_bus_source,
        spool_frames,
    )

    assert _validated_options({"path": "/x", "maxFilesPerTrigger": "2"}) == {
        "path": "/x", "maxfilespertrigger": "2",
    }
    spool = str(tmp_path / "spool")
    frames = spark.createDataFrame(
        [("k1", '{"v": 1}'), ("k2", '{"v": 2}')], "key string, value string"
    )
    spool_frames(frames, spool, seq=0)
    register_bus_source(spark)
    # batch half tolerates the (no-op) pacing knob
    got = (
        spark.read.format("bus_upsert")
        .option("path", spool)
        .option("maxFilesPerTrigger", "1")
        .load()
    )
    assert got.count() == 2


def test_bus_source_option_gate_property():
    """Property pin for the bus gate, the same shape as
    postgres_cdc's (VERDICT r13 #3 + r13 #5's vocabulary-tie
    standard): ANY subset of the known options (either
    maxFilesPerTrigger case) + the `paths` passthrough parses, and
    adding ANY outside key — near-misses included — raises a
    ValueError naming every offender lower-cased. The vocabulary is
    tied to the production sets so it cannot drift."""
    import pytest as _pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import (
        _KNOWN_OPTION_KEYS,
        _PASSTHROUGH_KEYS,
        _validated_options,
    )

    known = {"path": "/tmp/spool", "maxFilesPerTrigger": "3"}
    assert {k.lower() for k in known} == set(_KNOWN_OPTION_KEYS)
    assert _PASSTHROUGH_KEYS == {"paths"}
    bad_keys = st.sampled_from(
        ["maxFilesPerTrigge", "maxfilespertriggers", "pth", "startingOffsets",
         "topic", "subscribe", "state_path", "spool"]
    )

    @given(
        st.sets(st.sampled_from(sorted(known))),
        st.booleans(),
        st.booleans(),
        st.sets(bad_keys, max_size=3),
    )
    @settings(max_examples=soak_examples(60), deadline=None)
    def check(keys, lower_spelling, with_paths, bads):
        opts = {(k.lower() if lower_spelling else k): known[k] for k in keys}
        if with_paths:
            opts["paths"] = "/tmp/spool"
        _validated_options(dict(opts))  # valid subset parses
        if bads:
            poisoned = dict(opts)
            for b in bads:
                poisoned[b] = "x"
            with _pytest.raises(ValueError) as err:
                _validated_options(poisoned)
            for b in bads:
                assert b.lower() in str(err.value)

    check()


def test_bus_spool_offsets_model_property(tmp_path):
    """Model-based property over the spool reader's offset machinery
    (pure Python — no Spark session): random interleavings of
    publishes, drains, clean restarts, and retention deletions of
    COMMITTED prefix files must deliver every published record
    exactly once, in spool order within each file. This composes the
    behaviors the example tests pin one at a time — name-range
    planning, the pacing baseline, restart seeding, the incarnation
    epoch that keeps a fresh reader's rebased count from tripping the
    truncation guard after retention — under arbitrary schedules.

    The model: `published` is the ordered list of (file, line) records
    ever spooled; `delivered` accumulates what read() yields across
    all reader incarnations; after a final drain the two must match
    exactly (no loss from retention + publish races, no re-delivery
    across restarts)."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import BusUpsertStreamReader

    ops = st.lists(
        st.one_of(
            st.tuples(st.just("publish"), st.integers(1, 3)),
            st.tuples(st.just("drain"), st.just(0)),
            st.tuples(st.just("restart"), st.just(0)),
            st.tuples(st.just("retain"), st.just(0)),
            st.tuples(st.just("publish_paced"), st.integers(1, 3)),
        ),
        min_size=1,
        max_size=12,
    )

    @given(ops)
    @settings(max_examples=soak_examples(40), deadline=None)
    def check(schedule):
        import os
        import shutil
        import uuid as _uuid

        spool = str(tmp_path / f"spool_{_uuid.uuid4().hex[:8]}")
        os.makedirs(spool)
        published: list[str] = []   # record payloads ever spooled
        delivered: list[str] = []   # what read() yielded, all incarnations
        committed_files: set[str] = set()  # fully delivered+committed names
        seq = 0

        def publish(n_rows):
            nonlocal seq
            name = f"frames-{seq:08d}-0000.jsonl"
            with open(os.path.join(spool, name), "w") as fh:
                for i in range(n_rows):
                    payload = f"{name}:{i}"
                    fh.write(_json.dumps({"key": payload, "value": payload}) + "\n")
                    published.append(payload)
            seq += 1
            return name

        def drain(reader, start):
            """The micro-batch loop: latestOffset → partitions → read →
            commit, until the offset stops advancing.

            Single-outstanding-batch contract (ADVICE r14): the
            committed-floor carve-out in bus_upsert assumes the engine
            only ever passes a committed offset (or the initial one) as
            partitions() start — Spark MicroBatchExecution replans at
            most one uncommitted batch, from the committed offset. This
            loop MUST keep mirroring that, asserted against the set of
            offsets actually committed (∪ the initial offset), so a
            future edit that pipelines multiple uncommitted batches
            through the model is caught loudly."""
            while True:
                end = reader.latestOffset()
                if end == start:
                    return end
                assert _off_key(start) in known_floors, (
                    "model property violated the single-outstanding-batch "
                    "contract: partitions() start was never committed "
                    "(nor the initial offset)"
                )
                batch_files = set()
                for p in reader.partitions(start, end):
                    if p.path is None:
                        continue
                    batch_files.add(os.path.basename(p.path))
                    for row in reader.read(p):
                        delivered.append(row[0])
                reader.commit(end)
                known_floors.add(_off_key(end))
                committed_files.update(batch_files)
                start = end

        def _off_key(off):
            return _json.dumps(off, sort_keys=True)

        # engine bootstrap: fresh start, no checkpoint
        reader = BusUpsertStreamReader(spool)
        start = reader.initialOffset()
        known_floors = {_off_key(start)}
        paced_reader = False
        for op, arg in schedule:
            if op == "publish":
                publish(arg)
            elif op == "publish_paced":
                publish(arg)
            elif op == "drain":
                start = drain(reader, start)
            elif op == "restart":
                # clean restart from the committed offset: a FRESH
                # incarnation (new epoch) resumes from `start`
                reader = BusUpsertStreamReader(
                    spool, max_files_per_trigger=1 if paced_reader else None
                )
                paced_reader = not paced_reader
            elif op == "retain":
                # broker retention: delete the oldest committed file
                # (never an undelivered one — that IS data loss and the
                # guard's job is to scream, pinned elsewhere)
                victims = sorted(committed_files)[:1]
                for v in victims:
                    path = os.path.join(spool, v)
                    if os.path.exists(path):
                        os.remove(path)
                    # drop the victim from the committed set so the
                    # NEXT retain deletes the next-oldest file instead
                    # of re-targeting this one (ADVICE r14: widens the
                    # schedules actually exercised)
                    committed_files.discard(v)
        # final catch-up, then the books must balance exactly
        start = drain(reader, start)
        assert delivered == published
        shutil.rmtree(spool, ignore_errors=True)

    check()


def test_bus_spool_empty_spool_restart_after_full_retention_not_truncation(tmp_path):
    """Regression for the crash the offsets model property found: a
    restart against a FULLY-RETAINED (empty) spool makes the
    un-seeded latestOffset emit {last: ""} below the checkpoint; the
    engine (equality-only offset compare) records it, the next
    partitions() seeds the reader's watermark+count from the
    checkpointed span, and the first post-restart publish used to
    plan a same-epoch span ("" -> new] that tripped the truncation
    guard — a permanent crash-loop on a supported scenario (retention
    of committed files). The fix is two-fold: seeding rotates the
    reader's epoch (the seed REBASES the count, so pre-seed offsets
    are not count-comparable despite the shared id), and an empty
    span ending at or below the committed floor (every partitions()
    start / commit() end) serves as an empty batch instead of a
    truncation error. Genuine truncation — an UNDELIVERED file
    vanishing from a planned span — must stay loud."""
    import json as _json
    import os

    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.bus_upsert import BusUpsertStreamReader

    spool = str(tmp_path / "spool")
    os.makedirs(spool)

    def publish(seq):
        name = f"frames-{seq:08d}-0000.jsonl"
        with open(os.path.join(spool, name), "w") as fh:
            fh.write(_json.dumps({"key": name, "value": name}) + "\n")
        return name

    delivered = []

    def drain(reader, start):
        while True:
            end = reader.latestOffset()
            if end == start:
                return start
            for p in reader.partitions(start, end):
                if p.path:
                    delivered.extend(r[0] for r in reader.read(p))
            reader.commit(end)
            start = end

    a = BusUpsertStreamReader(spool)
    start = a.initialOffset()
    f0 = publish(0)
    start = drain(a, start)
    assert delivered == [f0]
    # broker retention removes the fully-committed file; the job
    # restarts against the now-EMPTY spool
    os.remove(os.path.join(spool, f0))
    b = BusUpsertStreamReader(spool)
    start = drain(b, start)          # the anomaly window: offset regresses to ""
    f1 = publish(1)
    start = drain(b, start)          # used to crash-loop here
    assert delivered == [f0, f1]     # exactly once, in order
    # the floor carve-out must NOT swallow genuine truncation: an
    # undelivered file vanishing from a PLANNED span stays loud
    spool2 = str(tmp_path / "spool2")
    os.makedirs(spool2)
    c = BusUpsertStreamReader(spool2)
    s2 = c.initialOffset()
    name = f"frames-{0:08d}-0000.jsonl"
    with open(os.path.join(spool2, name), "w") as fh:
        fh.write(_json.dumps({"key": "k", "value": "v"}) + "\n")
    e2 = c.latestOffset()            # planned, never committed
    os.remove(os.path.join(spool2, name))
    with pytest.raises(RuntimeError, match="truncated"):
        c.partitions(s2, e2)

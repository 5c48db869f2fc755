"""Source-format breadth + streaming window consistency.

The reference consumes exactly two wire formats (Postgres WAL JSON and
Pulsar topic JSON, StreamingJobWithCustomDeserializer.java:64-118); a
production corpus pipeline also lands JSONL and CSV extracts.  These
queries run a write→stream/read→aggregate round trip through each
format and hash-match an oracle computed straight from the parquet
tables — format fidelity IS the assertion.  `tumbling_window_streamed`
is the A2 stream-batch consistency twin (same shape as
`cdc_pipeline_streamed` for A3/A1).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register

#: shared oracle: per-type event counts + value sum (3-decimal round
#: absorbs summation-order skew, as in `tumbling_window`).
_EVENTS_AGG_SQL = """
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM events GROUP BY event_type
"""


def _events_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 3).alias("total_value"),
    )


@register("jsonl_roundtrip", _EVENTS_AGG_SQL)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source: events rendered to JSON lines, read back with an
    explicit schema (no inference pass — at 100 TB schema inference is
    a full extra scan), aggregated.  Matching the parquet-side oracle
    asserts lossless double/string round-tripping through the codec."""
    work = tempfile.mkdtemp(prefix="jsonl_src_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        ev.coalesce(4).write.mode("overwrite").json(work)
        back = spark.read.schema("event_type string, value double").json(work)
        pdf = _events_agg(back).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(
        pdf, "event_type string, n_events long, total_value double"
    )


@register("csv_roundtrip", _EVENTS_AGG_SQL)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source: same round trip through headered CSV with an
    explicit schema (inference would both rescan and lose types)."""
    work = tempfile.mkdtemp(prefix="csv_src_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        ev.coalesce(4).write.mode("overwrite").option("header", True).csv(work)
        back = (
            spark.read.schema("event_type string, value double")
            .option("header", True)
            .csv(work)
        )
        pdf = _events_agg(back).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(
        pdf, "event_type string, n_events long, total_value double"
    )


@register("orc_roundtrip", _EVENTS_AGG_SQL)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source: the same write→read→aggregate round trip through
    Spark's built-in columnar ORC codec (vectorized reader, predicate
    pushdown — the warehouse-interchange format next to parquet)."""
    work = tempfile.mkdtemp(prefix="orc_src_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        ev.coalesce(4).write.mode("overwrite").orc(work)
        back = spark.read.schema("event_type string, value double").orc(work)
        pdf = _events_agg(back).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(
        pdf, "event_type string, n_events long, total_value double"
    )


@register(
    "tumbling_window_streamed",
    """
    SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_us,
           COUNT(1) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def tumbling_window_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 run through the STREAMING path: events replayed from parquet
    files into `readStream`, event-time tumbling window aggregate to a
    memory sink in complete mode, final table hash-matched against the
    batch `tumbling_window` oracle — the stream-batch consistency
    claim for windowed aggregation (StreamingJob.java:96-98).

    Complete mode keeps every window in state for the demo replay; the
    production path is watermark + append (asserted separately in
    tests/test_streaming.py) where state is bounded by lateness."""
    work = tempfile.mkdtemp(prefix="win_streamed_")
    tbl = f"win_streamed_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf_dir, "events").select("ts", "value")
        src = os.path.join(work, "src")
        ev.coalesce(4).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
        agg = (
            stream.groupBy(F.window(F.col("ts"), "5 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 3).alias("total_value"),
            )
            .select(
                F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "n_events",
                "total_value",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(tbl)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        pdf = spark.table(tbl).toPandas()
    finally:
        spark.catalog.dropTempView(tbl) if tbl in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(
        pdf, "window_start_us long, n_events long, total_value double"
    )


@register(
    "session_window_streamed",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SESSION windows (30-min gap) through the streaming
    path: events replayed from files, `F.session_window` + watermark
    in append mode, finalized sessions hash-matched against the same
    lag-gap-cumsum oracle as the batch `session_window` query (minus
    the ordinal, which streaming semantics don't define).

    Append-mode sessions only emit once the watermark passes
    session-end + gap, and the watermark used by batch N comes from
    batch N-1 — so the replay appends two far-future sentinel files
    (maxFilesPerTrigger=1 forces them into separate batches): sentinel
    1 advances the watermark past every real session, sentinel 2
    triggers the batch that applies it. Sentinel rows are dropped from
    the result. Streaming window end = last event + gap, so gap is
    subtracted to match the batch MAX(ts)."""
    import time as _time

    work = tempfile.mkdtemp(prefix="sess_streamed_")
    tbl = f"sess_streamed_{uuid.uuid4().hex[:8]}"
    gap_us = 30 * 60 * 1_000_000
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
        src = os.path.join(work, "src")
        ev.coalesce(1).write.mode("overwrite").parquet(src)
        max_ts = ev.agg(F.max("ts")).first()[0]
        _time.sleep(1.05)  # main file strictly first in mtime order
        for i, days in enumerate((1, 2)):
            # SQL literal row, not createDataFrame: a Python-list local
            # relation evaluates through a Python-RDD job (worker
            # startup per write, ~4s); a literal SELECT stays JVM-side
            sent_ts = (max_ts + __import__("datetime").timedelta(days=days)).strftime(
                "%Y-%m-%d %H:%M:%S.%f"
            )
            sent = spark.sql(
                f"SELECT CAST({-1 - i} AS BIGINT) AS user_id, TIMESTAMP '{sent_ts}' AS ts"
            )
            # sentinel order among themselves is irrelevant (watermark
            # is monotone; maxFilesPerTrigger=1 separates batches)
            sent.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                "n_events",
                F.unix_micros(F.col("w.start")).alias("session_start_us"),
                (F.unix_micros(F.col("w.end")) - F.lit(gap_us)).alias("session_end_us"),
            )
        )
        # the stateful plan instantiates one state store per shuffle
        # partition per micro-batch; a 3-batch demo replay doesn't need
        # the full width — capture, narrow, and restore the conf (the
        # streaming plan pins the value at query start)
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                agg.writeStream.format("memory")
                .queryName(tbl)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        pdf = spark.table(tbl).filter(F.col("user_id") >= 0).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (a Python-list local relation would
    # re-evaluate through Python workers on every downstream action)
    return spark.createDataFrame(
        pdf, "user_id long, n_events long, session_start_us long, session_end_us long"
    )


@register(
    "tumbling_window_late_streamed",
    """
    SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_us,
           COUNT(1) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def tumbling_window_late_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 with LATE DATA at the watermark boundary: the events table is
    replayed as batch 1; batch 2 is a far-future sentinel that advances
    the event-time watermark past every real window; batch 3 re-delivers
    the 200 EARLIEST events — every one now behind the watermark, so the
    engine must DROP them all (append-mode finalized windows are
    immutable); batch 4 is a second sentinel that triggers the batch
    applying the first one. Hash-matching the batch oracle computed on
    the ORIGINAL events only proves the drop actually happened — if any
    late row leaked into a finalized window, its count/sum would shift.
    The include side of the boundary (late-but-within-delay rows DO
    count) is pinned by the golden watermark test in
    tests/test_streaming.py.

    Production shape: watermark + append bounds window state by
    lateness — the form that survives an unbounded stream, unlike the
    complete-mode demo replay of `tumbling_window_streamed`."""
    import datetime as _dt
    import time as _time

    work = tempfile.mkdtemp(prefix="win_late_streamed_")
    tbl = f"win_late_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf_dir, "events").select("ts", "value")
        src = os.path.join(work, "src")
        ev.coalesce(1).write.mode("overwrite").parquet(src)
        max_ts = ev.agg(F.max("ts")).first()[0]
        max_us = int(max_ts.timestamp() * 1_000_000)
        # mtime gaps pin file → batch order (maxFilesPerTrigger=1)
        _time.sleep(1.05)
        for i, days in enumerate((1, 2)):
            sent_ts = (max_ts + _dt.timedelta(days=days)).strftime("%Y-%m-%d %H:%M:%S.%f")
            spark.sql(
                f"SELECT TIMESTAMP '{sent_ts}' AS ts, CAST(NULL AS DOUBLE) AS value"
            ).coalesce(1).write.mode("append").parquet(src)
            if i == 0:
                _time.sleep(1.05)
                # the late file must land AFTER sentinel 1 (mtime order);
                # duplicate the earliest 200 events — all far behind the
                # advanced watermark, so all must be dropped
                ev.orderBy("ts").limit(200).coalesce(1).write.mode("append").parquet(src)
                _time.sleep(1.05)
        stream = (
            spark.readStream.schema("ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window(F.col("ts"), "5 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 3).alias("total_value"),
            )
            .select(
                F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "n_events",
                "total_value",
            )
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                agg.writeStream.format("memory")
                .queryName(tbl)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # sentinel windows start after max_ts — excluded from the claim
        pdf = spark.table(tbl).filter(F.col("window_start_us") <= max_us).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "window_start_us long, n_events long, total_value double"
    )


def dedup_within_watermark_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-form streaming dedup: `dropDuplicatesWithinWatermark`
    — dedup state is EVICTED once the watermark passes an event's time
    + delay, so state is bounded by lateness instead of growing with
    every key ever seen (the scale-killer in plain dropDuplicates at
    100 TB). The events table is replayed twice in separate
    micro-batches; the delay is set beyond the dataset's time span so
    both copies land inside the horizon and the result must equal
    exact COUNT(DISTINCT) — any state eviction firing early (or a
    duplicate surviving) breaks the hash."""
    work = tempfile.mkdtemp(prefix="dedup_wm_streamed_")
    tbl = f"dedup_wm_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
        src = os.path.join(work, "src")
        ev.coalesce(1).write.mode("overwrite").parquet(src)
        ev.coalesce(1).write.mode("append").parquet(src)  # the duplicate copy
        stream = (
            spark.readStream.schema("event_id long, event_type string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        deduped = stream.withWatermark("ts", "365 days").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                deduped.writeStream.format("memory")
                .queryName(tbl)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        pdf = (
            spark.table(tbl)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique"))
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "event_type string, n_unique long")


register(
    "dedup_within_watermark_streamed",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events GROUP BY event_type
    """,
)(dedup_within_watermark_streamed)


@register(
    "dedup_streamed",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events GROUP BY event_type
    """,
)
def dedup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the events table is replayed TWICE (two
    file copies → every record duplicated across batches) through
    `readStream` + `dropDuplicates(event_id)`; the surviving rows are
    appended to a memory sink and counted per type.  Hash-matching
    COUNT(DISTINCT) over the single-copy batch table proves the
    cross-batch dedup state actually dropped the second copy.

    Unbounded dedup state is fine for a bounded replay; the
    production form is dropDuplicatesWithinWatermark, where state is
    evicted past the lateness bound."""
    work = tempfile.mkdtemp(prefix="dedup_streamed_")
    tbl = f"dedup_streamed_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
        src = os.path.join(work, "src")
        ev.coalesce(1).write.mode("overwrite").parquet(src)
        ev.coalesce(1).write.mode("append").parquet(src)  # the duplicate copy
        stream = (
            spark.readStream.schema("event_id long, event_type string")
            .option("maxFilesPerTrigger", 1)  # copies land in separate batches
            .parquet(src)
        )
        q = (
            stream.dropDuplicates(["event_id"])
            .writeStream.format("memory")
            .queryName(tbl)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        pdf = (
            spark.table(tbl)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique"))
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "event_type string, n_unique long")


@register(
    "stream_stream_join_streamed",
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT v.user_id,
           CAST(COUNT(1) AS BIGINT) AS n_pairs,
           CAST(SUM(epoch_us(c.ts) - epoch_us(v.ts)) AS BIGINT) AS lag_us_checksum
    FROM v JOIN c ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '1 hour'
    GROUP BY v.user_id
    """,
)
def stream_stream_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time STREAM-STREAM inner join: views and clicks read as
    two independent file streams, joined per user with the time-range
    constraint click ∈ [view, view + 1h], matched pairs appended to a
    memory sink and aggregated per user.  Hash-matching the batch
    range-join oracle (pair count AND the summed view→click lag in
    exact integer microseconds) proves the streaming join emitted
    exactly the batch pair set — the enrichment-join shape the
    reference materializes between its two CDC topics
    (StreamingJobWithCustomDeserializer.java:93-118).

    Inner stream-stream joins emit matches as rows arrive (no
    watermark wait); the watermarks + time bound are what let Spark
    evict join state once the other side can no longer match — the
    property that keeps state bounded on an unbounded stream. The
    per-user aggregation of emitted pairs runs as a normal batch over
    the sink table."""
    work = tempfile.mkdtemp(prefix="ssj_streamed_")
    tbl = f"ssj_streamed_{uuid.uuid4().hex[:8]}"
    schema = "user_id long, ts timestamp, event_type string"
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
        src = os.path.join(work, "src")
        ev.coalesce(2).write.mode("overwrite").parquet(src)
        views = (
            spark.readStream.schema(schema)
            .parquet(src)
            .filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "0 seconds")
        )
        clicks = (
            spark.readStream.schema(schema)
            .parquet(src)
            .filter(F.col("event_type") == "click")
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "0 seconds")
        )
        joined = views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            "inner",
        ).select(
            F.col("v_user").alias("user_id"),
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
        # stateful join instantiates a state store per shuffle
        # partition; narrow for the demo replay, restore after
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                joined.writeStream.format("memory")
                .queryName(tbl)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        pdf = (
            spark.table(tbl)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("lag_us").alias("lag_us_checksum"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(pdf, "user_id long, n_pairs long, lag_us_checksum long")


@register(
    "schema_merge_roundtrip",
    """
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_value,
           ROUND(SUM(CASE WHEN event_id % 2 = 1 THEN value ELSE 0 END), 3) AS total_value
    FROM events GROUP BY event_type
    """,
)
def schema_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the lake: generation 1 files carry
    (event_id, event_type), generation 2 adds a `value` column; the
    merged read (`mergeSchema`) back-fills NULL for gen-1 rows.  The
    oracle recomputes the same split from the base table, so the hash
    match proves the merged scan neither drops rows nor mis-aligns the
    added column — the upgrade path the reference leaves explicitly
    untested (README.md:141-144, 'schema evolution not tested').

    Scale note: mergeSchema reconciles footers at planning time (cost
    ∝ #files, not bytes); production pins the superset schema in a
    catalog and reads with an explicit schema instead — shown here
    with the footer-merge path because that is the evolution moment
    itself."""
    work = tempfile.mkdtemp(prefix="schema_merge_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        gen1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "event_type")
        gen2 = ev.filter(F.col("event_id") % 2 == 1)
        gen1.coalesce(2).write.mode("overwrite").parquet(work)
        gen2.coalesce(2).write.mode("append").parquet(work)
        back = spark.read.option("mergeSchema", True).parquet(work)
        pdf = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count("value").alias("n_with_value"),
                F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 3).alias("total_value"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(
        pdf, "event_type string, n_events long, n_with_value long, total_value double"
    )


@register(
    "stream_static_join_streamed",
    """
    SELECT user_id % 3 AS tier,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM events GROUP BY 1
    """,
)
def stream_static_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join: the events stream joined against
    a static dimension (user → tier) loaded as a plain batch
    DataFrame, aggregated per tier after the sink.  This is the
    reference's core enrichment move — a CDC-materialized table
    joined to the live stream (README.md:96-118) — in Structured
    Streaming form: the static side needs no watermark or state, and
    Catalyst broadcasts it into every micro-batch.

    Hash-matching the batch oracle proves no stream row is lost or
    duplicated through the join. The dim here derives from the same
    events table (distinct user → tier) so the oracle is closed-form."""
    work = tempfile.mkdtemp(prefix="ssj_static_")
    tbl = f"ssj_static_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
        src = os.path.join(work, "src")
        ev.coalesce(2).write.mode("overwrite").parquet(src)
        dim = (
            ev.select("user_id")
            .distinct()
            .withColumn("tier", F.col("user_id") % 3)
        )
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        joined = stream.join(F.broadcast(dim), "user_id").select("tier", "value")
        q = (
            joined.writeStream.format("memory")
            .queryName(tbl)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        pdf = (
            spark.table(tbl)
            .groupBy("tier")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 3).alias("total_value"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(pdf, "tier long, n_events long, total_value double")


@register(
    "stream_stream_left_join_streamed",
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT v.user_id,
           CAST(COUNT(c.ts) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN c.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
           CAST(COALESCE(SUM(epoch_us(c.ts) - epoch_us(v.ts)), 0) AS BIGINT) AS lag_us_checksum
    FROM v LEFT JOIN c ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '1 hour'
    GROUP BY v.user_id
    """,
)
def stream_stream_left_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time STREAM-STREAM **LEFT OUTER** join: unlike the inner
    twin (`stream_stream_join_streamed`), an unmatched view must emit
    a NULL-click row — and may only do so once the watermark proves no
    click can still arrive inside [view, view + 1h]. That
    watermark-driven null emission is the semantic under test: the
    driver hash compares matched-pair counts, unmatched-view counts
    AND the exact matched-lag checksum against the batch LEFT JOIN
    oracle, so a row emitted early (phantom null), late (stuck in
    state), or twice flips the hash.

    A sentinel view+click pair 2h past the corpus maximum (user_id
    -1, excluded from the result) pushes the final watermark past
    every real view's eviction bound — the same trick the
    late-data window twin uses — so the outer rows for the last hour
    of the stream actually flush before the query stops. State stays
    bounded by the 1h time bound + watermark eviction, exactly the
    production contract on an unbounded stream."""
    work = tempfile.mkdtemp(prefix="sslj_streamed_")
    tbl = f"sslj_streamed_{uuid.uuid4().hex[:8]}"
    schema = "user_id long, ts timestamp, event_type string"
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
        max_ts = ev.agg(F.max("ts")).first()[0]  # 1-row bound for the sentinel
        sentinel = spark.createDataFrame(
            [(-1, max_ts, "view"), (-1, max_ts, "click")], schema
        ).select("user_id", (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts"), "event_type")
        src = os.path.join(work, "src")
        ev.unionByName(sentinel).coalesce(2).write.mode("overwrite").parquet(src)
        views = (
            spark.readStream.schema(schema)
            .parquet(src)
            .filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "0 seconds")
        )
        clicks = (
            spark.readStream.schema(schema)
            .parquet(src)
            .filter(F.col("event_type") == "click")
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "0 seconds")
        )
        joined = views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            "leftOuter",
        ).select(
            F.col("v_user").alias("user_id"),
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                joined.writeStream.format("memory")
                .queryName(tbl)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        pdf = (
            spark.table(tbl)
            .filter(F.col("user_id") != -1)
            .groupBy("user_id")
            .agg(
                F.count("lag_us").alias("n_matched"),
                F.sum(F.when(F.col("lag_us").isNull(), 1).otherwise(0)).alias("n_unmatched"),
                F.coalesce(F.sum("lag_us"), F.lit(0)).alias("lag_us_checksum"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "user_id long, n_matched long, n_unmatched long, lag_us_checksum long"
    )


@register(
    "sliding_window_streamed",
    """
    SELECT epoch_us(win_start) AS window_start_us, COUNT(1) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM (
      SELECT value,
             time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS win_start
      FROM events, (SELECT unnest([0, 1]) AS k))
    GROUP BY win_start
    """,
)
def sliding_window_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 SLIDING window (10 min / 5 min hop) through the streaming
    path — each event lands in two overlapping windows, so the
    streaming engine must maintain multiple concurrent window states
    per event; final table hash-matched against the batch
    `sliding_window` oracle (complete mode for the bounded replay;
    watermark+append is the production form, see the tumbling twins).
    Completes the windowed-aggregation streamed family: tumbling,
    session, and sliding all stream-batch-consistency graded."""
    work = tempfile.mkdtemp(prefix="slwin_streamed_")
    tbl = f"slwin_streamed_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, sf_dir, "events").select("ts", "value")
        src = os.path.join(work, "src")
        ev.coalesce(4).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
        agg = (
            stream.groupBy(F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 3).alias("total_value"),
            )
            .select(
                F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "n_events",
                "total_value",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(tbl)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        pdf = spark.table(tbl).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "window_start_us long, n_events long, total_value double"
    )


@register(
    "stream_stream_full_outer_streamed",
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT COALESCE(v.user_id, c.user_id) AS user_id,
           CAST(SUM(CASE WHEN v.ts IS NOT NULL AND c.ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN v.ts IS NOT NULL AND c.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_views,
           CAST(SUM(CASE WHEN v.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_clicks,
           CAST(COALESCE(SUM(epoch_us(c.ts) - epoch_us(v.ts)), 0) AS BIGINT) AS lag_us_checksum
    FROM v FULL JOIN c ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '1 hour'
    GROUP BY 1
    """,
)
def stream_stream_full_outer_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time STREAM-STREAM **FULL OUTER** join — completes the
    graded join family (inner, left outer, and now both-sides outer):
    an unmatched VIEW must emit a null-click row AND an unmatched
    CLICK must emit a null-view row, each only once the watermark
    proves its match window is closed (a click's candidate views lie
    in [c_ts - 1h, c_ts]). The driver hash compares matched counts,
    BOTH unmatched counts, and the exact matched-lag checksum against
    the batch FULL JOIN oracle — a row emitted early, late, or twice
    on either side flips the hash.

    Same sentinel trick as the left twin: one view+click pair 2h past
    the corpus maximum (user -1, excluded) drives both watermarks past
    every real row's eviction bound so outer rows flush before stop.
    State bounded by the 1h condition + watermark eviction."""
    work = tempfile.mkdtemp(prefix="ssfo_streamed_")
    tbl = f"ssfo_streamed_{uuid.uuid4().hex[:8]}"
    schema = "user_id long, ts timestamp, event_type string"
    try:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
        max_ts = ev.agg(F.max("ts")).first()[0]  # 1-row bound for the sentinel
        sentinel = spark.createDataFrame(
            [(-1, max_ts, "view"), (-1, max_ts, "click")], schema
        ).select("user_id", (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts"), "event_type")
        src = os.path.join(work, "src")
        ev.unionByName(sentinel).coalesce(2).write.mode("overwrite").parquet(src)
        views = (
            spark.readStream.schema(schema)
            .parquet(src)
            .filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "0 seconds")
        )
        clicks = (
            spark.readStream.schema(schema)
            .parquet(src)
            .filter(F.col("event_type") == "click")
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "0 seconds")
        )
        joined = views.join(
            clicks,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            "fullOuter",
        ).select(
            F.coalesce(F.col("v_user"), F.col("c_user")).alias("user_id"),
            F.col("v_ts").isNotNull().alias("has_view"),
            F.col("c_ts").isNotNull().alias("has_click"),
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                joined.writeStream.format("memory")
                .queryName(tbl)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        pdf = (
            spark.table(tbl)
            .filter(F.col("user_id") != -1)
            .groupBy("user_id")
            .agg(
                F.sum((F.col("has_view") & F.col("has_click")).cast("long")).alias("n_matched"),
                F.sum((F.col("has_view") & ~F.col("has_click")).cast("long")).alias(
                    "n_unmatched_views"
                ),
                F.sum((~F.col("has_view")).cast("long")).alias("n_unmatched_clicks"),
                F.coalesce(F.sum("lag_us"), F.lit(0)).alias("lag_us_checksum"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf,
        "user_id long, n_matched long, n_unmatched_views long, "
        "n_unmatched_clicks long, lag_us_checksum long",
    )


#: full-table snapshot state — the oracle for `cdc_snapshot_chunked`
#: AND its restart twin `cdc_snapshot_resume`: both must cover the key
#: space exactly once no matter where (or whether) the stream stopped.
_SNAPSHOT_AGG_ORACLE = """
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
    """


@register("cdc_snapshot_chunked", _SNAPSHOT_AGG_ORACLE)
def cdc_snapshot_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CHUNKED SNAPSHOT path at sf scale through the engine's
    source API (round-7 regression guard for the keyset snapshot in
    `sources/postgres_cdc.py`): the production planner paces the
    events table into keyset spans (8192-row chunks, 4 per trigger →
    several engine-planned micro-batches at sf0.1) whose rows are read
    EXECUTOR-side through the parquet-backed snapshot client, rendered
    as op='r' Debezium envelopes, then parsed back and aggregated.
    Hash-matching the direct-scan oracle proves the chunk planner
    covers the key space exactly once — no seam gaps, no overlaps —
    and the bench timing guards the snapshot path's throughput.

    Scale shape: driver handles only chunk metadata (boundary keys);
    row bytes move executor-side, one task per chunk — the property
    that makes the 100-TB snapshot viable."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import register_snapshot_bench

    register_snapshot_bench(spark)
    tbl = f"snapchunk_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="snapchunk_ckpt_")
    try:
        q = (
            spark.readStream.format("cdc_snapshot_bench")
            .option("path", os.path.join(sf_dir, "events.parquet"))
            .option("table", "events")
            .option("pk", "event_id")
            .option("snapshotChunkSize", "8192")
            .option("snapshot_chunks_per_trigger", "4")
            .load()
            .writeStream.format("memory")
            .queryName(tbl)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        parsed = spark.table(tbl).select(
            F.from_json(
                "value",
                "struct<after: struct<event_id: bigint, user_id: bigint, event_type: string>>",
            ).alias("e")
        )
        # materialize INSIDE the cleanup block and drop the memory
        # sink table (the sibling streamed queries' pattern): a lazy
        # return over the uuid-named memory table would pin the full
        # sf-scale envelope set in driver memory per invocation with
        # no handle left to drop it
        pdf = (
            parsed.groupBy(F.col("e.after.event_type").alias("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("e.after.event_id").alias("id_checksum"),
                F.max("e.after.user_id").alias("max_user"),
            )
            .toPandas()
        )
        return spark.createDataFrame(
            pdf, "event_type string, n_rows long, id_checksum long, max_user long"
        )
    finally:
        spark.catalog.dropTempView(tbl)
        shutil.rmtree(ckpt, ignore_errors=True)


#: live state of the synthetic WAL feed (insert per even event_id,
#: update per %10, delete per %14) — the oracle for `cdc_wal_tail`
#: AND its restart twin `cdc_wal_tail_resume`: both must converge to
#: the same table no matter where the stream was stopped.
_WAL_LIVE_ORACLE = """
    WITH final AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN 'updated' ELSE event_type END AS event_type
      FROM events
      WHERE event_id % 2 = 0 AND event_id % 14 <> 0
    )
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_live,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM final GROUP BY event_type
    """


@register("cdc_wal_tail", _WAL_LIVE_ORACLE)
def cdc_wal_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAL TAIL path at sf scale through the engine's source API
    (VERDICT r7 #5 — the snapshot got its bench guard in round 7, the
    tail had none): the production tail planner peeks a synthetic
    ~67k-record change feed (insert per even event, update for every
    event_id%10, delete for every event_id%14, in LSN order) from a
    parquet-backed slot with real peek semantics — non-destructive,
    confirmed-position, limit-bounded — so `_peek_covering`'s doubling
    window, the wal2json→Debezium envelope translation, and per-batch
    slot advancement all run over several engine-planned micro-batches.
    The envelopes are then changelog-compacted (last record per key by
    LSN, deletes drop) and the live state hash-matched against the
    direct-table oracle: translation or planning that drops, reorders,
    or duplicates any record shifts the checksum.

    Scale shape: the tail is driver-planned by nature (a changelog
    slot is a single ordered stream — Debezium does the same
    single-threaded read in the reference); volume rides in bounded
    per-batch spans (poll_batch_size start, doubling only past
    uncommitted spans). Compaction is one shuffle on the key
    (max_by, JVM-side), then a partial-agg shuffle on event_type."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import register_wal_bench

    register_wal_bench(spark)
    tbl = f"waltail_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="waltail_ckpt_")
    try:
        q = (
            spark.readStream.format("cdc_wal_bench")
            .option("path", os.path.join(sf_dir, "events.parquet"))
            .option("table", "events")
            .option("poll_batch_size", "32768")
            .load()
            .writeStream.format("memory")
            .queryName(tbl)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        pdf = _wal_envelopes_to_live(spark.table(tbl)).toPandas()
        return spark.createDataFrame(pdf, "event_type string, n_live long, id_checksum long")
    finally:
        spark.catalog.dropTempView(tbl)
        shutil.rmtree(ckpt, ignore_errors=True)


def _wal_envelopes_to_live(raw: DataFrame) -> DataFrame:
    """Changelog-compact raw (value, lsn) WAL envelopes from the
    ``cdc_wal_bench`` feed into live per-event_type counts: last
    record per key by LSN, deletes drop, then one partial-agg shuffle
    on event_type. Shared by `cdc_wal_tail` and its restart twin so
    both grade through identical compaction."""
    parsed = raw.select(
        F.col("lsn"),
        F.from_json(
            "value",
            "struct<op: string, "
            "after: struct<event_id: bigint, user_id: bigint, event_type: string>, "
            "before: struct<event_id: bigint, user_id: bigint, event_type: string>>",
        ).alias("e"),
    )
    keyed = parsed.select(
        F.coalesce("e.after.event_id", "e.before.event_id").alias("event_id"),
        F.col("lsn"),
        F.struct(F.col("e.op").alias("op"), F.col("e.after.event_type").alias("event_type")).alias("rec"),
    )
    live = (
        keyed.groupBy("event_id")
        .agg(F.max_by("rec", "lsn").alias("last"))
        .filter(F.col("last.op") != "d")
    )
    return live.groupBy(F.col("last.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("event_id").alias("id_checksum"),
    )


@register("cdc_wal_tail_resume", _WAL_LIVE_ORACLE)
def cdc_wal_tail_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once WAL-tail RESTART under the driver hash (VERDICT
    r8 #5 — `cdc_wal_tail` grades planning/translation/pacing; the
    live suite restarts real streams but is not value-graded): the
    same production tail over the same synthetic feed is STOPPED
    mid-feed after at least one committed micro-batch, then a second
    incarnation resumes from the checkpoint — the durable bench slot
    (`state_path`, the server-side confirmed position a real slot
    keeps) plus the engine's offset log must replay the uncommitted
    span by literal LSN bounds and continue, with the parquet file
    sink's metadata log deduplicating any batch the crash re-runs.
    The union of both incarnations' output is changelog-compacted and
    hash-matched to the direct-table oracle: one lost, duplicated, or
    reordered record anywhere across the restart shifts the checksum.

    The stop point is deliberately nondeterministic (whenever ≥ 1
    batch has committed) — the oracle is split-invariant, which IS
    the claim: exactly-once holds no matter where the crash lands.
    Scale shape: identical to `cdc_wal_tail` (driver-planned ordered
    slot, bounded spans split into ≤wal_rows_per_partition tasks);
    the poll window is sized to the feed so every scale stops with
    real work left for the resumed incarnation."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import register_wal_bench

    register_wal_bench(spark)
    work = tempfile.mkdtemp(prefix="waltail_resume_")
    out = os.path.join(work, "out")
    events_path = os.path.join(sf_dir, "events.parquet")
    # ~0.67 feed records per event row; size the poll window for ~5
    # micro-batches at ANY scale so the mid-feed stop leaves the
    # resumed incarnation real work even at the sf0.01 grading scale
    n_events = spark.read.parquet(events_path).count()
    poll = max(256, (n_events * 2) // (3 * 5))

    def build_reader():
        return (
            spark.readStream.format("cdc_wal_bench")
            .option("path", events_path)
            .option("table", "events")
            .option("poll_batch_size", str(poll))
            .option("state_path", os.path.join(work, "slot_state.json"))
            .load()
        )

    try:
        _run_with_restart(spark, build_reader, out, work)
        # spark.read honors the file sink's _spark_metadata log, so
        # files from batches the crash abandoned are invisible —
        # this read IS the exactly-once contract being graded
        pdf = _wal_envelopes_to_live(spark.read.parquet(out)).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "event_type string, n_live long, id_checksum long")


def _run_with_restart(spark, build_reader, out: str, work: str) -> None:
    """Start a streaming query, stop it after at least one committed
    micro-batch (the deliberate 'crash'), then run a second
    incarnation from the same checkpoint to completion. The stop
    point is nondeterministic by design — the caller's oracle must be
    split-invariant, which is exactly the exactly-once claim."""
    import time

    def incarnation():
        return (
            build_reader()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .start()
        )

    q = incarnation()
    deadline = time.time() + 180
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p.get("batchId", -1) >= 1:
            break  # >=1 batch durably committed: crash now
        time.sleep(0.05)
    q.stop()  # the in-flight batch is abandoned mid-write
    q2 = incarnation()
    q2.processAllAvailable()
    q2.stop()


@register("cdc_snapshot_resume", _SNAPSHOT_AGG_ORACLE)
def cdc_snapshot_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once MID-SNAPSHOT restart under the driver hash — the
    snapshot twin of `cdc_wal_tail_resume` (the live suite restarts a
    real snapshot at demo scale; this grades the identical triage at
    sf scale by value): the chunked keyset snapshot is stopped after
    at least one committed micro-batch, and the second incarnation
    must resume from the DURABLE progress row (`state_path` — the
    engineered equivalent of the source-DB progress row a real
    deployment keeps) at its exact keyset position, replay the
    abandoned span by literal key bounds, and finish. Every key
    exactly once across the restart or the id checksum shifts.

    Scale shape: identical to `cdc_snapshot_chunked` (driver holds
    chunk metadata only; rows read executor-side per chunk); the
    chunk size adapts to the table so every scale yields several
    paced batches with real work left after the stop."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import register_snapshot_bench

    register_snapshot_bench(spark)
    work = tempfile.mkdtemp(prefix="snapresume_")
    out = os.path.join(work, "out")
    events_path = os.path.join(sf_dir, "events.parquet")
    n_events = spark.read.parquet(events_path).count()
    chunk = max(256, n_events // 12)

    def build_reader():
        return (
            spark.readStream.format("cdc_snapshot_bench")
            .option("path", events_path)
            .option("table", "events")
            .option("pk", "event_id")
            .option("snapshotChunkSize", str(chunk))
            .option("snapshot_chunks_per_trigger", "2")
            .option("state_path", os.path.join(work, "slot_state.json"))
            .load()
        )

    try:
        _run_with_restart(spark, build_reader, out, work)
        parsed = spark.read.parquet(out).select(
            F.from_json(
                "value",
                "struct<after: struct<event_id: bigint, user_id: bigint, event_type: string>>",
            ).alias("e")
        )
        pdf = (
            parsed.groupBy(F.col("e.after.event_type").alias("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("e.after.event_id").alias("id_checksum"),
                F.max("e.after.user_id").alias("max_user"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "event_type string, n_rows long, id_checksum long, max_user long"
    )


@register(
    "cdc_snapshot_tail_handoff",
    """
    WITH final AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN 'updated' ELSE event_type END AS event_type
      FROM events
      WHERE event_id % 14 <> 0
    )
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_live,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM final GROUP BY event_type
    """,
)
def cdc_snapshot_tail_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL production pipeline at sf scale under one value hash —
    chunked keyset snapshot, snapshot->WAL handoff, tail translation,
    AND a restart, in a single graded stream (`cdc_snapshot_chunked`
    and `cdc_wal_tail` guard the phases separately; the live suite
    drives the handoff at demo scale; this grades it at sf scale):
    the two-phase bench client snapshots every event, then serves
    updates (%10 -> 'updated') and deletes (%14) as the WAL tail. The
    stream is stopped after >=1 committed batch — with several paced
    snapshot batches the stop normally lands MID-SNAPSHOT — and the
    second incarnation resumes through the durable progress row,
    finishes the snapshot, crosses into the tail (first WAL advance
    clears the progress row), and drains the feed. Changelog
    compaction (last per key by LSN; snapshot rows carry lsn 0 so any
    tail record for the same key wins) then one partial agg; a lost,
    duplicated, or double-applied record anywhere — either phase,
    either incarnation — shifts the checksum.

    Scale shape: snapshot rows ride executor-side chunk reads; tail
    volume rides bounded spans split into <=wal_rows_per_partition
    tasks; compaction is one max_by shuffle on the key."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.snapshot_bench import register_full_bench

    register_full_bench(spark)
    work = tempfile.mkdtemp(prefix="handoff_")
    out = os.path.join(work, "out")
    events_path = os.path.join(sf_dir, "events.parquet")
    n_events = spark.read.parquet(events_path).count()
    chunk = max(256, n_events // 12)

    def build_reader():
        return (
            spark.readStream.format("cdc_full_bench")
            .option("path", events_path)
            .option("table", "events")
            .option("pk", "event_id")
            .option("snapshotChunkSize", str(chunk))
            .option("snapshot_chunks_per_trigger", "2")
            .option("poll_batch_size", str(max(256, n_events // 10)))
            .option("state_path", os.path.join(work, "slot_state.json"))
            .load()
        )

    try:
        _run_with_restart(spark, build_reader, out, work)
        pdf = _wal_envelopes_to_live(spark.read.parquet(out)).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "event_type string, n_live long, id_checksum long")


@register("xml_roundtrip", _EVENTS_AGG_SQL)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source (Spark 4's NATIVE xml file format — no spark-xml
    package): the same write→read→aggregate round trip through
    rowTag-framed XML with an explicit schema (inference would rescan;
    XML is the interchange format of the enterprise feeds a curation
    stack still ingests). Matching the parquet-side oracle asserts
    lossless double/string round-tripping through the markup codec —
    value escaping, self-closing empties, whitespace framing."""
    work = tempfile.mkdtemp(prefix="xml_src_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_type", "value")
        ev.coalesce(4).write.mode("overwrite").format("xml").option(
            "rowTag", "event"
        ).save(work)
        back = (
            spark.read.schema("event_type string, value double")
            .format("xml")
            .option("rowTag", "event")
            .load(work)
        )
        pdf = _events_agg(back).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # Arrow-path re-materialization (see session_window_streamed)
    return spark.createDataFrame(
        pdf, "event_type string, n_events long, total_value double"
    )

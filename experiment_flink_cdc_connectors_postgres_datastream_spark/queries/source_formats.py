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
        rows = _events_agg(back).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_events long, total_value double"
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
        rows = _events_agg(back).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_events long, total_value double"
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
        rows = spark.table(tbl).collect()
    finally:
        spark.catalog.dropTempView(tbl) if tbl in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "window_start_us long, n_events long, total_value double"
    )

"""Message-bus sinks (K1/K2): keyed-JSON topic writes and the console
debug sink.

Reference parity: the Pulsar sink serializes each typed event to JSON,
sets the message key to the event's upsert key bytes, and writes one
topic per table with AT_LEAST_ONCE semantics
(StreamingJobWithCustomDeserializer.java:93-118; topic-per-table
README.md:131). The Kafka/Pulsar wire shape in Spark is identical:
``key binary, value binary`` (+ ``topic``) — ``to_keyed_json``
produces exactly that projection, so the same DataFrame works with
``format("kafka")``, a Pulsar connector, or (for tests) a parquet
capture of the frames.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pyspark.sql import Column


def to_keyed_json(
    df: DataFrame,
    key_col: str = "key",
    topic: str | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Project a typed event stream to the bus wire shape:
    ``key: binary`` (upsert key bytes, Pulsar keyBytes analog),
    ``value: binary`` (JSON of the event payload), and optionally a
    constant ``topic`` column (topic-per-table routing)."""
    payload = [c for c in (value_cols or df.columns)]
    cols: list[Column] = [
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload])).cast("binary").alias("value"),
    ]
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    return df.select(*cols)


def write_stream_to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic: str | None = None,
    query_name: str = "bus_sink",
):
    """Start an at-least-once keyed write to a Kafka-API bus (needs the
    spark-sql-kafka package on the cluster; the wire projection itself
    is covered by tests without a broker)."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer.start()


def write_stream_to_console(df: DataFrame, query_name: str = "console_sink", num_rows: int = 20):
    """K1 console/print sink (StreamingJob.java:80-81). Ordering within
    a partition is preserved; the reference pins parallelism 1 for
    global order — per-key order via key partitioning is the scalable
    equivalent."""
    return (
        df.writeStream.format("console")
        .option("numRows", num_rows)
        .queryName(query_name)
        .start()
    )

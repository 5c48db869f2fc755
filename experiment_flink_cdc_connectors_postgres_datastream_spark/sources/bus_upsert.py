"""Upsert table over a message-bus changelog (S4): the reference's
`upsert-pulsar` SQL table — `PRIMARY KEY (key) NOT ENFORCED`, raw key
/ JSON value, metadata columns `eventTime TIMESTAMP(3) METADATA`,
`properties MAP METADATA`, virtual `topic`/`sequenceId`
(StreamingJobWithCustomDeserializer.java:156-174).

Spark's Kafka-API sources expose the same wire fields
(`key`,`value`,`topic`,`timestamp`,`offset`,`headers`); this module
turns such a frame into (a) a typed changelog with the metadata
columns surfaced, and (b) the materialized upsert view (latest value
per key — batch via `compact_latest`, streaming via
`streaming.compaction`)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import compact_latest

#: wire metadata ↔ reference DDL mapping (SJCD:162-165):
#:   timestamp ↔ eventTime METADATA, topic ↔ topic VIRTUAL,
#:   offset ↔ sequenceId VIRTUAL, headers ↔ properties METADATA
BUS_METADATA_COLS = ["topic", "timestamp", "offset"]


def changelog_from_bus(df: DataFrame, value_schema: StructType) -> DataFrame:
    """Typed changelog from a Kafka-shaped frame: casts the raw key,
    parses the JSON value into columns, and surfaces the bus metadata
    (`topic`, `event_time`, `sequence_id`)."""
    present = [c for c in BUS_METADATA_COLS if c in df.columns]
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("_v"),
        *[F.col(c) for c in present],
    )
    renames = {"timestamp": "event_time", "offset": "sequence_id"}
    for c in present:
        out = out.withColumnRenamed(c, renames.get(c, c))
    return out.select(
        "key",
        *[F.col(f"_v.{f.name}").alias(f.name) for f in value_schema.fields],
        *[renames.get(c, c) for c in present],
    )


def upsert_view(
    changelog: DataFrame,
    key_cols: list[str] = ("key",),
    seq_cols: list[str] = ("sequence_id",),
    op_col: str | None = None,
) -> DataFrame:
    """Materialize the upsert table: latest row per PRIMARY KEY
    (`PRIMARY KEY … NOT ENFORCED` semantics — enforcement happens
    here, by compaction, not at write time)."""
    return compact_latest(changelog, list(key_cols), list(seq_cols), op_col=op_col)

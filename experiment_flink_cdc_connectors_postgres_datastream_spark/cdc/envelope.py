"""Debezium CDC envelope data model: schema, parse, project, demux.

Reference parity:
- envelope shape (`before`/`after`/`source`/`op`/`ts_ms`) from the
  record dumps in StreamingJob.java:84-87 and
  StreamingJobWithCustomDeserializer.java:237-240;
- the custom deserializer's projection + per-table dispatch
  (StreamingJobWithCustomDeserializer.java:221-272) becomes
  ``parse_cdc`` (``from_json`` + struct navigation) and
  ``project_flat``/``demux`` (filter branches);
- the composite upsert key ``"{schema}|{id}"``
  (StreamingJobWithCustomDeserializer.java:284,320) becomes
  ``with_key`` (``concat_ws``).

Everything here is pure DataFrame expression — Catalyst prunes the
parsed-JSON schema down to the referenced fields (OptimizeJsonExprs),
which reproduces the reference's manual "selectively grabs column
data" optimization (README.md:128) automatically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

#: Debezium `source` block (StreamingJob.java:84-87 dumps).
SOURCE_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField("connector", StringType()),
        StructField("name", StringType()),
        StructField("ts_ms", LongType()),
        StructField("db", StringType()),
        StructField("schema", StringType()),
        StructField("table", StringType()),
        StructField("txId", LongType()),
        StructField("lsn", LongType()),
    ]
)

#: op codes: r=snapshot read, c=create, u=update, d=delete
#: (README.md:64-68; delete listed untested in the reference —
#: README.md:143 — we support it via tombstones in changelog.py).
OPS = ("r", "c", "u", "d")


def envelope_schema(row_schema: StructType) -> StructType:
    """Full Debezium envelope for a table with the given row schema.

    ``unavailable`` lists the after-image columns whose values were
    NOT on the wire (pgoutput's unchanged-TOAST tuple kind 'u' — the
    column is out-of-line and the UPDATE did not rewrite it). Most
    envelopes omit the key entirely (``from_json`` then yields NULL);
    consumers that materialize state must treat a listed column as
    "keep the prior value", not as NULL — see
    ``changelog.resolve_unavailable``."""
    return StructType(
        [
            StructField("before", row_schema),
            StructField("after", row_schema),
            StructField("source", SOURCE_SCHEMA),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField("unavailable", ArrayType(StringType())),
        ]
    )


def parse_cdc(df: DataFrame, row_schema: StructType, value_col: str = "value") -> DataFrame:
    """Parse a raw JSON CDC stream into typed envelope columns.

    Input: one string column (``value_col``) holding the Debezium JSON
    envelope (what the reference's deserializer receives as a
    SourceRecord, StreamingJobWithCustomDeserializer.java:234).
    Output: the input columns plus ``before``, ``after``, ``source``,
    ``op``, ``ts_ms``.
    """
    parsed = df.withColumn("_env", F.from_json(F.col(value_col), envelope_schema(row_schema)))
    return parsed.select(
        *[c for c in df.columns if c != value_col],
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
        F.col("_env.source").alias("source"),
        F.col("_env.op").alias("op"),
        F.col("_env.ts_ms").alias("ts_ms"),
        F.col("_env.unavailable").alias("unavailable"),
    )


def with_key(df: DataFrame, *parts: str | Column, key_col: str = "key", sep: str = "|") -> DataFrame:
    """Derived composite key ``part1|part2|…`` — the logical-merge
    upsert key that keeps the same id distinct across pg-schemas
    (StreamingJobWithCustomDeserializer.java:284)."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return df.withColumn(key_col, F.concat_ws(sep, *[c.cast("string") for c in cols]))


def project_flat(
    df: DataFrame, table: str, fields: list[str], keep_unavailable: bool = False
) -> DataFrame:
    """Typed flat event for one table: keep ``op``, ``schema``,
    ``table`` and the requested ``after.*`` fields; on deletes
    (``after`` is null) fall back to ``before.*`` so the key columns
    survive (the reference never handles deletes — we do).

    Mirrors the per-table case branches of the custom deserializer
    (StreamingJobWithCustomDeserializer.java:247-264): unmatched
    tables are dropped (implicit filter — no default branch).

    ``keep_unavailable=True`` carries the envelope's TOAST
    ``unavailable`` column-name list through — required input for
    ``changelog.resolve_unavailable`` when the table has columns
    large enough to be TOASTed."""
    row = F.when(F.col("after").isNotNull(), F.col("after")).otherwise(F.col("before"))
    extra = [F.col("unavailable")] if keep_unavailable else []
    return df.filter(F.col("source.table") == F.lit(table)).select(
        F.col("op"),
        F.col("source.schema").alias("schema"),
        F.col("source.table").alias("table"),
        F.col("ts_ms"),
        F.col("source.lsn").alias("lsn"),
        *[row.getField(f).alias(f) for f in fields],
        *extra,
    )


def demux(df: DataFrame, tables: dict[str, list[str]]) -> dict[str, DataFrame]:
    """Side-output analog (StreamingJobWithCustomDeserializer.java:204-218):
    one parsed stream → N typed per-table DataFrames.

    Spark re-derives each branch's plan from the shared lineage; when
    cross-sink consistency matters use sinks.routing.route_foreach_batch
    (single pass, persisted batch) instead.
    """
    return {t: project_flat(df, t, fields) for t, fields in tables.items()}


def parse_cdc_with_dead_letter(
    df: DataFrame, row_schema: StructType, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Fault-tolerant variant of :func:`parse_cdc`: malformed envelope
    JSON is routed to a dead-letter DataFrame instead of silently
    becoming all-null rows (the reference's deserializer would throw
    and fail the job, StreamingJobWithCustomDeserializer.java:234-272;
    at 100 TB a single bad record must not kill the pipeline).

    Returns ``(good, dead)``: ``good`` has the typed envelope columns
    of ``parse_cdc``; ``dead`` keeps the raw ``value`` plus a
    ``_reason`` column. Both derive from one PERMISSIVE parse of the
    input — no second scan.
    """
    schema = envelope_schema(row_schema).add("_corrupt_record", StringType())
    parsed = df.withColumn(
        "_env",
        F.from_json(
            F.col(value_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    bad = F.col("_env").isNull() | F.col("_env._corrupt_record").isNotNull() | (
        F.col("_env.op").isNull() & F.col("_env.after").isNull() & F.col("_env.before").isNull()
    )
    good = parsed.filter(~bad).select(
        *[c for c in df.columns if c != value_col],
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
        F.col("_env.source").alias("source"),
        F.col("_env.op").alias("op"),
        F.col("_env.ts_ms").alias("ts_ms"),
    )
    dead = parsed.filter(bad).select(
        *df.columns,
        F.when(F.col("_env").isNull() | F.col("_env._corrupt_record").isNotNull(),
               F.lit("malformed_json")).otherwise(F.lit("empty_envelope")).alias("_reason"),
    )
    return good, dead

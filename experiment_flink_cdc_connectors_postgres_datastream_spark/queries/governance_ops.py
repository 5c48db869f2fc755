"""Data-governance / pipeline-hygiene queries: PII detection and
redaction, deterministic output sharding, distribution audits
(unigram entropy, z-score outliers).

These are the compliance/QA stages a training-data pipeline runs
between the CDC-fed raw corpus (the reference's ingest surface,
README.md:96-118) and a training shard export.  The `documents`
corpus is synthetic word-soup with no natural PII, so `pii_redact`
first injects deterministic PII inside the query — identically in
Spark and the DuckDB oracle — and then proves detection + redaction
over it; format of the proof: per-source hit counts AND a
zero-residual column AND a redacted-length checksum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register

#: portable across Java regex (Spark) and RE2 (DuckDB): no lookaround,
#: no backrefs, explicit classes only.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+1-\d{3}-\d{4}"


@register(
    "pii_redact",
    f"""
    WITH enriched AS (
      SELECT source,
             text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS t
      FROM documents),
    red AS (
      SELECT source, t,
             regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                            '{PHONE_RE}', '<PHONE>', 'g') AS redacted
      FROM enriched)
    SELECT source,
           CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(t, '{EMAIL_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS n_email_docs,
           CAST(SUM(CASE WHEN regexp_matches(t, '{PHONE_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS n_phone_docs,
           CAST(SUM(CASE WHEN regexp_matches(redacted, '{EMAIL_RE}')
                           OR regexp_matches(redacted, '{PHONE_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS n_residual,
           CAST(SUM(length(redacted)) AS BIGINT) AS redacted_chars
    FROM red GROUP BY source
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact: inject deterministic emails/phones (doc_id
    mod 5 / mod 7), find them by regex, replace with placeholder
    tokens, and prove the result — per-source hit counts, a residual
    count that must be 0, and a redacted-length checksum that pins the
    exact replacement output, not just "something changed".

    Scale shape: pure per-row column expressions (concat, two
    regexp_replace passes) inside whole-stage codegen, then ONE hash
    aggregation on source — zero joins, zero Python, one shuffle. The
    regexes are RE2/Java-portable; redaction cost is O(bytes scanned),
    the same plan at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    enriched = docs.select("source", t.alias("t"))
    red = enriched.withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace("t", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
    )
    one = F.lit(1)
    zero = F.lit(0)
    return red.groupBy("source").agg(
        F.count(one).alias("n_docs"),
        F.sum(F.when(F.col("t").rlike(EMAIL_RE), one).otherwise(zero)).alias(
            "n_email_docs"
        ),
        F.sum(F.when(F.col("t").rlike(PHONE_RE), one).otherwise(zero)).alias(
            "n_phone_docs"
        ),
        F.sum(
            F.when(
                F.col("redacted").rlike(EMAIL_RE) | F.col("redacted").rlike(PHONE_RE),
                one,
            ).otherwise(zero)
        ).alias("n_residual"),
        F.sum(F.length("redacted")).alias("redacted_chars"),
    )


@register(
    "shard_assignment",
    """
    SELECT CAST(strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS INT) AS shard,
           CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents GROUP BY 1
    """,
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = last md5 hex
    nibble of the doc id (0..15) — reproducible across engines, runs,
    and restarts, unlike `rand()` or `monotonically_increasing_id`.
    id_checksum proves both engines assign the SAME rows to each
    shard, not merely equal counts; n_docs shows the balance.

    Scale shape: one codegen'd hash projection + one 16-group
    aggregation with map-side combine — this is exactly the shuffle
    a `write.partitionBy(shard)` export performs, measured before
    paying for the write. At 100 TB widen to 4 hex chars (65536
    shards) by taking substr(..., 29, 4)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    shard = F.expr(
        "locate(substring(md5(CAST(doc_id AS STRING)), 32, 1), '0123456789abcdef') - 1"
    ).cast("int")
    return docs.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("id_checksum"),
    )


@register(
    "word_entropy",
    """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
    c AS (
      SELECT source, word, COUNT(1) AS n FROM w WHERE word <> '' GROUP BY 1, 2),
    t AS (
      SELECT source, SUM(n) AS total FROM c GROUP BY 1)
    SELECT c.source,
           CAST(MAX(t.total) AS BIGINT) AS n_tokens,
           CAST(COUNT(1) AS BIGINT) AS n_distinct,
           ROUND(-SUM((n / total) * ln(n / total)), 4) AS entropy
    FROM c JOIN t USING (source)
    GROUP BY c.source
    """,
)
def word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram Shannon entropy (nats): the distribution
    audit that catches a source gone degenerate (boilerplate spam ⇒
    entropy collapses; random noise ⇒ entropy at the vocab ceiling).

    Scale shape: explode → (source, word) count with map-side combine
    — the same word-count shuffle as the reference's Splitter job
    (StreamingJob.java:105-112) — then a per-source total joined back
    (broadcast: |sources| rows) and one final per-source agg. Entropy
    math is pure codegen'd arithmetic on the counts."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    c = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("total"))
    p = F.col("n") / F.col("total")
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source")
        .agg(
            F.max("total").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
        )
    )


@register(
    "zscore_outliers",
    """
    WITH s AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ABS((e.value - s.mu) / s.sd) > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(MAX(ABS((e.value - s.mu) / s.sd)), 3) AS max_z
    FROM events e JOIN s USING (event_type)
    GROUP BY e.event_type
    """,
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier detection: two-pass
    mean/stddev, then |z| > 2.5 counting — the standard numeric-column
    QA gate before a value feeds a feature or reward signal.

    Scale shape: one per-type moment aggregation (|event_types| rows,
    broadcast back), then a codegen'd scoring pass over the scan and a
    final per-type agg — two scans, two tiny shuffles, no window. The
    single-pass alternative (collect values per key) does not scale;
    this shape does."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sd"))
    return (
        ev.join(F.broadcast(s), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(z > 2.5, F.lit(1)).otherwise(F.lit(0))).alias("n_outliers"),
            F.round(F.max(z), 3).alias("max_z"),
        )
    )


@register(
    "curation_pipeline",
    """
    WITH feat AS (
      SELECT doc_id, source, lower(text) AS lt, text,
             len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 w -> w IN ('the','a','an','of','and','to','in','is','it','that'))) AS n_stop,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             length(text) AS n_chars_calc
      FROM documents),
    scored AS (
      SELECT doc_id, source, lt, n_tokens,
             0.5 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
               + 0.3 * least(CAST(n_stop AS DOUBLE) / n_tokens * 10.0, 1.0)
               + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars_calc * 5.0, 1.0)) AS q,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 w -> w IN ('the','a','of','and','to'))) AS s_en,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 w -> w IN ('der','die','das','und','ist'))) AS s_de,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 w -> w IN ('el','la','de','y','que'))) AS s_es,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                 w -> w IN ('le','la','et','les','des'))) AS s_fr
      FROM feat),
    cand AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lt, '\\s+', ' ', 'g'))) AS fp
      FROM scored
      WHERE q >= 0.75 AND n_tokens BETWEEN 20 AND 80
        AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr),
    flagged AS (
      SELECT doc_id, source,
             CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY fp)
                  THEN 1 ELSE 0 END AS is_kept
      FROM cand)
    SELECT source,
           CAST(COUNT(1) AS BIGINT) AS n_candidates,
           CAST(SUM(is_kept) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN is_kept = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_checksum
    FROM flagged GROUP BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composition a training-data
    team actually ships: quality score ≥ 0.75 AND 20–80 tokens AND
    predicted-English, then exact dedup by normalized-text
    fingerprint keeping the lowest doc id.  Per-source survivor counts
    plus a kept-id checksum prove both engines curate the SAME corpus.

    Scale shape: every filter is a codegen'd column expression over
    ONE documents scan (no intermediate materialization); dedup is a
    min-over-fingerprint window — one hash shuffle on fp, which is
    also the natural output bucketing for the surviving corpus — then
    one per-source aggregation. Filters run BEFORE the shuffle, so
    the dedup exchange only carries survivors (at 100 TB the quality
    gate typically drops half the bytes before any network cost)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import (
        fingerprint,
        lang_scores,
        quality_features,
    )
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = lang_scores(quality_features(docs))
    cand = fingerprint(
        scored.filter(
            (F.col("quality_score") >= 0.75)
            & F.col("n_tokens").between(20, 80)
            & (F.col("pred_lang") == "en")
        )
    ).select("doc_id", "source", "fp")
    is_kept = (
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp"))
    ).cast("int")
    flagged = cand.select("doc_id", "source", is_kept.alias("is_kept"))
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("is_kept").alias("n_kept"),
        F.sum(F.when(F.col("is_kept") == 1, F.col("doc_id")).otherwise(F.lit(0))).alias(
            "kept_checksum"
        ),
    )


@register(
    "mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(1), 6) AS outlier_rate,
           ROUND(MAX(m.mad), 6) AS mad
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier detection: median absolute deviation with the
    1.4826 normal-consistency constant (|v − median| > 3·1.4826·MAD)
    per event type — unlike the z-score variant (`zscore_outliers`),
    the threshold itself is immune to the outliers it hunts, the
    standard robust filter before training-data statistics are
    trusted.

    Scale shape: two grouped exact medians (order statistics; at
    100 TB swap in approx_percentile — mergeable sketch, bounded
    memory, same plan) + one broadcast-sized per-group stats join
    back onto the scan; counts are map-side-combined."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("long")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_out).alias("n_outliers"),
        F.round(F.sum(is_out).cast("double") / F.count(F.lit(1)), 6).alias("outlier_rate"),
        F.round(F.max("mad"), 6).alias("mad"),
    )


@register(
    "winsorized_stats",
    """
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS lo,
             quantile_cont(value, 0.99) AS hi
      FROM events GROUP BY event_type),
    w AS (
      SELECT e.event_type,
             CASE WHEN e.value < b.lo THEN b.lo
                  WHEN e.value > b.hi THEN b.hi
                  ELSE e.value END AS wv,
             CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END AS clipped
      FROM events e JOIN b USING (event_type))
    SELECT event_type,
           CAST(COUNT(1) AS BIGINT) AS n_events,
           CAST(SUM(clipped) AS BIGINT) AS n_clipped,
           ROUND(AVG(wv), 6) AS wins_mean,
           ROUND(STDDEV_SAMP(wv), 6) AS wins_std
    FROM w GROUP BY event_type
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics: values clipped to the
    [p01, p99] band before mean/stddev — the third member of the
    outlier-handling family (z-score flags, MAD gates, winsorizing
    REPAIRS) and the standard way to report stable corpus statistics
    when heavy tails would otherwise dominate.

    Scale shape: one exact grouped quantile pass (approx_percentile at
    100 TB, same plan), broadcast of the per-group bounds back onto
    the scan, map-side-combined moments."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    )
    w = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .alias("wv"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .cast("long")
        .alias("clipped"),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("clipped").alias("n_clipped"),
        F.round(F.avg("wv"), 6).alias("wins_mean"),
        F.round(F.stddev_samp("wv"), 6).alias("wins_std"),
    )


@register(
    "k_anonymity_audit",
    """
    WITH cells AS (
      SELECT lang, source, COUNT(1) AS n_docs
      FROM documents GROUP BY lang, source)
    SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
           (n_docs < 5) AS below_k
    FROM cells
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (lang, source):
    every equivalence-class cell with its size and a below-k flag
    (k=5 — the conventional release threshold; cells under it would
    need suppression or generalization before publication). The
    release-safety complement to `pii_redact`'s content scrubbing.
    One map-side-combined hash aggregation — group-cardinality-sized
    output at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("below_k", F.col("n_docs") < 5)
    )

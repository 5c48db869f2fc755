"""Text-analysis queries (§7.4 extensions) over `documents`."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import (
    BPE_PATTERN,
    EN_STOPWORDS,
    LANG_MARKERS,
    fingerprint,
    lang_scores,
    quality_features,
    token_count,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register

_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@register(
    "token_count",
    f"""
    SELECT doc_id,
           len(regexp_split_to_array(lower(text), '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting per document."""
    docs = load_table(spark, sf_dir, "documents")
    return token_count(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


@register(
    "quality_score",
    f"""
    WITH feat AS (
      SELECT doc_id,
             length(text) AS n_chars_calc,
             len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             w -> w IN ({_STOP_SQL}))) AS n_stop,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
      FROM documents),
    ratios AS (
      SELECT doc_id, n_chars_calc, n_tokens, n_stop,
             CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
             CAST(n_punct AS DOUBLE) / n_chars_calc AS punct_ratio
      FROM feat)
    SELECT doc_id, n_chars_calc, n_tokens, n_stop, stop_ratio, punct_ratio,
           0.5 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
               + 0.3 * least(stop_ratio * 10.0, 1.0)
               + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0)) AS quality_score
    FROM ratios
    """,
)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length/stopword/punctuation features
    + linear score (shared formula with the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "n_stop", "stop_ratio", "punct_ratio", "quality_score"
    )


def _marker_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w IN ({words})))"
    )


@register(
    "lang_id",
    f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_marker_sql('en')} AS s_en,
             {_marker_sql('de')} AS s_de,
             {_marker_sql('es')} AS s_es,
             {_marker_sql('fr')} AS s_fr
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS pred_lang,
           s_en, s_de, s_es, s_fr
    FROM scores
    """,
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-marker scoring with deterministic
    argmax (tie order en>de>es>fr, identical in the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return lang_scores(docs).select(
        "doc_id", "lang", "pred_lang", "s_en", "s_de", "s_es", "s_fr"
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fp")


@register(
    "text_stats_by_source",
    """
    SELECT source, COUNT(1) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(1), 4) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY source
    """,
)
def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level text statistics per source (exact integer sums)."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = F.count(F.lit(1))
    return docs.groupBy("source").agg(
        cnt.alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / cnt, 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "vocab_top_terms",
    """
    SELECT term, cnt, token_id
    FROM (SELECT term, cnt,
                 row_number() OVER (ORDER BY cnt DESC, term) AS token_id
          FROM (SELECT term, COUNT(1) AS cnt
                FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
                      FROM documents) u
                WHERE term <> ''
                GROUP BY term) tc) ranked
    WHERE token_id <= 100
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 terms with dense ids (count desc,
    term asc; id 0 reserved for OOV)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import build_vocab

    return build_vocab(load_table(spark, sf_dir, "documents"), size=100)


@register(
    "tokens_to_ids",
    """
    WITH vocab AS (
      SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS token_id
      FROM (SELECT term, COUNT(1) AS cnt
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
                  FROM documents) u
            WHERE term <> ''
            GROUP BY term) tc
      QUALIFY token_id <= 100),
    toks AS (
      SELECT doc_id, t.term, t.pos
      FROM (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS term,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS pos
            FROM documents) t
      WHERE t.term <> '')
    SELECT doc_id,
           array_to_string(list(COALESCE(token_id, 0) ORDER BY pos), ',')
             AS token_ids_csv
    FROM toks LEFT JOIN vocab USING (term)
    GROUP BY doc_id
    """,
)
def tokens_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded as ordered token-id sequences against the
    top-100 vocabulary (OOV → 0) — the text→ints step of a training
    pipeline.

    The graded output renders the id sequence as one csv string per
    document (`token_ids_csv`): byte-identical information to the
    `array<int>` column `encode_tokens` produces, but scalar, so any
    order-canonicalizing comparator can sort/hash it. Downstream
    consumers keep using `encode_tokens` directly for the typed array."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import build_vocab, encode_tokens

    docs = load_table(spark, sf_dir, "documents")
    encoded = encode_tokens(docs, build_vocab(docs, size=100))
    return encoded.select(
        "doc_id",
        F.concat_ws(",", F.col("token_ids").cast("array<string>")).alias("token_ids_csv"),
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(1) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT doc_id, term,
           ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM (SELECT doc_id, term, tf, df, n_docs,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tf * ln(CAST(n_docs AS DOUBLE) / df) DESC,
                                             term) AS rn
          FROM tf JOIN df USING (term) CROSS JOIN n) ranked
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic relevance
    weighting a retrieval/quality pipeline computes over a corpus.
    tf and df are integer counts (exact); ln() over the same double
    ratio is bit-identical in both engines; ties broken by term.
    Three shuffles total: tf groupBy, df groupBy (tiny), per-doc
    top-k window — the df and corpus-size sides broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select(
            "doc_id", "term", F.round("tfidf", 6).alias("tfidf"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "bpe_pair_counts",
    r"""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
      FROM documents),
    wf AS (SELECT word, COUNT(1) AS freq FROM w
           WHERE length(word) > 0 GROUP BY word),
    p AS (
      SELECT word, freq,
             unnest(list_transform(range(1, length(word)),
                    i -> substring(word, i, 2))) AS pair
      FROM wf WHERE length(word) >= 2)
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
    FROM p GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 20
    """,
)
def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BPE merge candidates (adjacent character pairs weighted
    by word frequency) — the distributed inner step of tokenizer
    training, computed on the distinct-word table so cost is bounded
    by vocabulary, not corpus size."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import bpe_pair_counts

    return bpe_pair_counts(load_table(spark, sf_dir, "documents"), top_k=20)


@register("bpe_learn_merges")
def bpe_learn_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 10 LEARNED BPE merge rules over the corpus (the full
    iterative trainer loop, not just one round of pair counts):
    per-round vocabulary-bounded pair aggregation, 1-row argmax
    collect, higher-order-function greedy merge fold, checkpointed
    lineage — see operators/text.py:learn_bpe_merges. Rows-only by
    contract (an N-round argmax-dependent rewrite isn't expressible as
    one DuckDB query); exact equivalence against a pure-Python
    reference trainer is pytest-enforced
    (tests/test_operators.py::test_learn_bpe_merges_matches_reference)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import learn_bpe_merges

    merges = learn_bpe_merges(load_table(spark, sf_dir, "documents"), n_merges=10)
    import pandas as pd

    pdf = pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])
    return spark.createDataFrame(pdf, "rank long, left string, right string, pair_count long")


@register(
    "lang_confusion_matrix",
    f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_marker_sql('en')} AS s_en,
             {_marker_sql('de')} AS s_de,
             {_marker_sql('es')} AS s_es,
             {_marker_sql('fr')} AS s_fr
      FROM documents),
    pred AS (
      SELECT lang,
             CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM scores),
    t AS (
      SELECT lang,
             CAST(COUNT(1) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM pred GROUP BY lang),
    p AS (
      SELECT pred_lang, CAST(COUNT(1) AS BIGINT) AS n_predicted
      FROM pred GROUP BY pred_lang)
    SELECT COALESCE(t.lang, p.pred_lang) AS lang,
           COALESCE(t.n_docs, 0) AS n_docs,
           COALESCE(t.n_correct, 0) AS n_correct,
           COALESCE(p.n_predicted, 0) AS n_predicted,
           CAST(CASE WHEN COALESCE(t.n_docs, 0) > 0
                THEN COALESCE(t.n_correct, 0) * 1000000 // t.n_docs ELSE 0 END AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN COALESCE(p.n_predicted, 0) > 0
                THEN COALESCE(t.n_correct, 0) * 1000000 // p.n_predicted ELSE 0 END AS BIGINT) AS precision_ppm
    FROM t FULL OUTER JOIN p ON t.lang = p.pred_lang
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality audit of the stopword-marker language ID:
    per-language recall and precision in integer ppm, over the labeled
    `lang` column — including the honest failure rows (a language the
    classifier cannot emit, like zh in the testdata, shows recall 0;
    a language it over-predicts shows depressed precision). This is
    the evaluation operator a curation stack runs BEFORE trusting a
    cheap classifier to route 100 TB — `lang_id` produces the
    predictions; this grades them.

    Scale shape: the marker scoring is zero-shuffle codegen'd column
    work; two small aggregations (truth by lang, volume by predicted
    lang — each ≤ #languages rows) full-outer-join driver-cheap."""
    docs = load_table(spark, sf_dir, "documents")
    pred = lang_scores(docs).select("lang", "pred_lang")
    t = pred.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("lang") == F.col("pred_lang")).cast("bigint")).alias("n_correct"),
    )
    # rename before the join: t and p share lineage (a self-join on
    # the scored frame), and duplicate column names are ambiguous
    p = (
        pred.groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n_predicted"))
        .withColumnRenamed("pred_lang", "plang")
    )
    j = t.join(p, t.lang == p.plang, "full_outer")
    n_docs = F.coalesce("n_docs", F.lit(0))
    n_correct = F.coalesce("n_correct", F.lit(0))
    n_predicted = F.coalesce("n_predicted", F.lit(0))
    return j.select(
        F.coalesce(t.lang, p.plang).alias("lang"),
        n_docs.alias("n_docs"),
        n_correct.alias("n_correct"),
        n_predicted.alias("n_predicted"),
        F.when(n_docs > 0, F.expr("coalesce(n_correct, 0) * 1000000 div n_docs"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("recall_ppm"),
        F.when(n_predicted > 0, F.expr("coalesce(n_correct, 0) * 1000000 div n_predicted"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("precision_ppm"),
    )

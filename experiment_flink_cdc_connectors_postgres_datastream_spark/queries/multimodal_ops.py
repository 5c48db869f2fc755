"""Multimodal-column queries (§7.4 extensions): binary payloads with
typed metadata over `documents` (stand-in for real media bytes)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_features,
    frame_sample,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import spread_scan
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.similarity import cosine_topk
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import register


@register(
    "multimodal_meta",
    """
    SELECT doc_id, 'image' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata columns (schema plumbing)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = attach_binary_payload(docs)
    return packed.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
    )


#: the fake decoder's arithmetic (operators/multimodal.py:_fake_decode)
#: over the UTF-8 payload of `text` — SQL-expressible because the
#: payload IS the text bytes and the corpus is ASCII, so the DuckDB
#: oracle can grade the whole mapInPandas Arrow path end-to-end even
#: though the decode itself is a stand-in for PIL/ffmpeg.
_DECODE_SQL = """
    SELECT doc_id, 'video' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(16 + strlen(text) % 64 AS INT) AS width,
           CAST(16 + (strlen(text) // 64) % 64 AS INT) AS height,
           CAST(1 + CASE WHEN strlen(text) > 0
                         THEN ascii(substr(text, 1, 1)) % 4 ELSE 0 END AS INT) AS n_frames
    FROM documents
"""


@register("multimodal_decode", _DECODE_SQL)
def multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode (stubbed): mapInPandas over binary payloads
    producing width/height/frame metadata. The decoder is an honest
    deterministic FAKE (PIL/ffmpeg absent) — but its arithmetic over
    the payload bytes is mirrored in the oracle, so the driver
    value-hash grades the mapInPandas plumbing (schema, batching,
    null-payload handling) end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_binary_payload(docs, media_type="video"))


@register(
    "multimodal_frames",
    f"""
    WITH d AS ({_DECODE_SQL})
    SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
    FROM d
    """,
)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: decoded videos → exploded sampled frame rows
    (JVM-side sequence explode; Python only in the decode stage)."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_binary_payload(docs, media_type="video"))
    return frame_sample(decoded, every_n=2).select("doc_id", "n_frames", "frame_idx")


@register(
    "multimodal_feature_topk",
    """
    WITH ch AS (
      SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) % 16 AS b
      FROM documents, unnest(range(1, strlen(text) + 1)) t(i)
      WHERE strlen(text) > 0),
    hist AS (
      SELECT doc_id, b, CAST(COUNT(1) AS DOUBLE) AS c FROM ch GROUP BY doc_id, b),
    nrm AS (SELECT doc_id, sqrt(SUM(c * c)) AS nz FROM hist GROUP BY doc_id),
    vec AS (
      SELECT h.doc_id, h.b, CAST(h.c / n.nz AS REAL) AS v
      FROM hist h JOIN nrm n USING (doc_id)),
    pairs AS (
      SELECT q.doc_id AS qid, c.doc_id AS doc_id,
             SUM(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)) AS dp
      FROM (SELECT * FROM vec WHERE doc_id % 100 = 0) q
      JOIN vec c ON q.b = c.b AND q.doc_id <> c.doc_id
      GROUP BY q.doc_id, c.doc_id),
    cn AS (
      SELECT doc_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS n2 FROM vec GROUP BY doc_id),
    scored AS (
      SELECT p.qid, p.doc_id,
             ROUND(p.dp / (sqrt(qn.n2) * sqrt(cn.n2)), 6) AS sim
      FROM pairs p JOIN cn qn ON qn.doc_id = p.qid
                 JOIN cn ON cn.doc_id = p.doc_id),
    ranked AS (
      SELECT qid, doc_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, doc_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def multimodal_feature_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal→ANN pipeline: payload → Arrow featurizer (byte
    histogram folded to 16 dims, L2-normalized, float32) → cosine
    top-5. The oracle reproduces the histogram arithmetic with the
    same float32 truncation (CAST AS REAL) before the double-precision
    cosine, so the whole mapInPandas→broadcast-join→window-rank chain
    is value-hash graded."""
    docs = load_table(spark, sf_dir, "documents")
    # spread BEFORE the featurizer: the single-row-group scan is one
    # task, and the checkpointed feats inherit its partitioning — so
    # without this both the Arrow featurizer AND the downstream
    # |corpus|×|queries| cosine dots ran on one core (spread_scan can't
    # fire on the checkpoint itself: non-file plan). Measured 2.2s →
    # ~0.6s at sf0.1/local[32]; a no-op on a many-file table.
    feats = extract_features(attach_binary_payload(spread_scan(docs))).localCheckpoint(
        eager=False
    )
    queries = feats.filter(F.col("doc_id") % 100 == 0)
    return cosine_topk(feats, queries, k=5, id_col="doc_id", vec_col="embedding")


@register(
    "multimodal_resize",
    """
    SELECT doc_id,
           CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           CAST(strlen(text) AS BIGINT) AS n_bytes_in,
           CAST(LEAST(strlen(text), 4096) AS BIGINT) AS n_bytes_out,
           md5(substring(text, 1, 4096)) AS checksum
    FROM documents
    """,
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-64x64 over binary payloads (mapInPandas, Arrow): the
    deterministic fake resize (byte-budget prefix + md5) is mirrored
    in SQL, so the Arrow exchange, batching, and checksum plumbing are
    value-hash graded end to end; with PIL present the same operator
    does a real Image.resize (pytest-gated, like decode)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(attach_binary_payload(docs), target_width=64, target_height=64)

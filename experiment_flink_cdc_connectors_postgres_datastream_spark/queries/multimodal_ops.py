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


@register("multimodal_decode")  # mapInPandas fake decoder → rows-only oracle
def multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode (stubbed): mapInPandas over binary payloads
    producing width/height/frame metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_binary_payload(docs, media_type="video"))


@register("multimodal_frames")  # depends on fake decoder → rows-only oracle
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: decoded videos → exploded sampled frame rows."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_binary_payload(docs, media_type="video"))
    return frame_sample(decoded, every_n=2).select("doc_id", "n_frames", "frame_idx")


@register("multimodal_feature_topk")  # fake featurizer → rows-only oracle
def multimodal_feature_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal→ANN pipeline: payload → Arrow featurizer →
    cosine top-5 over the extracted embeddings."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs)).localCheckpoint(eager=False)
    queries = feats.filter(F.col("doc_id") % 100 == 0)
    return cosine_topk(feats, queries, k=5, id_col="doc_id", vec_col="embedding")

"""Named query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 (and the §7.4 extensions) gets one
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. Column
names/aliases are contractually identical between the two.
"""

from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import QUERIES, ORACLES, register
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import reference_surface  # noqa: F401  (registers on import)
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import relational  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import tpch_suite  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import text_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import dedup_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import similarity_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import multimodal_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import windows_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import advanced_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import analytics_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import window_functions  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import pipeline_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import corpus_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import source_formats  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import behavior_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import governance_ops  # noqa: F401

# The correctness driver grades the FIRST 50 registered queries, in
# registration order. After round 4, every one of the 153 then-
# registered queries has a driver CORRECTNESS row in some round
# (cumulative coverage complete). Round-5 window policy (same
# rotation contract as r4): (1) every query whose code path or oracle
# changed this round gets a fresh grade — collect_sorted_ids
# (array→string canonicalization fix, the one red row of r4),
# the two sketch queries (reshaped from rows-only to banded
# full-oracle verdicts), minhash_calibration (size-gated persist),
# dup_rate_by_source_pair (distinct-union docs count), and the three
# multimodal queries over the reworked decode/resize (stdlib PNG
# fallback + sentinel guards); (2) every round-5 addition (ANN recall,
# semantic dedup, perplexity, vocab coverage, CDC chunking + chunk
# dedup, bus wire frames/round trip, tf-idf pairs, Zipf slope, Gopher
# battery + funnel, SCD2 history/as-of/streamed, JL projection, label
# centroids, left-outer stream-stream join, keep-best dedup,
# k-anonymity);
# (3) the stalest queries — everything whose latest grade is round 1
# (the TPC-H/relational block); (4) remaining slots to the oldest
# round-2 rows. Everything outside the window stays registered and
# locally verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path / oracle changed in round 5 → fresh grade ---
    "collect_sorted_ids", "approx_distinct_users",
    "approx_percentile_by_type", "minhash_calibration",
    "dup_rate_by_source_pair", "multimodal_decode", "multimodal_frames",
    "multimodal_resize",
    # --- (2) new in round 5 ---
    # ANN recall@10 audit: LSH vs exact top-k, value-hash graded
    "ann_recall_lsh",
    # SemDeDup-style keep-one-rep-per-embedding-bucket dedup
    "semantic_dedup_reps",
    # per-doc bigram perplexity (quality-filter input scores)
    "doc_perplexity",
    # corpus-derived vocab coverage per source (tokenizer fit)
    "tokenizer_coverage",
    # content-defined (rolling-hash) chunking statistics
    "content_defined_chunks",
    # K2 wire bytes (key + JSON value frames) value-hash graded
    "bus_wire_frames",
    # tf-idf cosine near-dup pairs (bag-of-words complement to shingles)
    "tfidf_cosine_pairs",
    # Zipf slope per source (corpus-health regression readout)
    "zipf_slope_by_source",
    # K2→S4→A3→A1 wire round trip graded vs the direct pipeline
    "bus_roundtrip_pipeline",
    # Gopher-rule quality battery + first-failing-rule funnel
    "gopher_quality_flags", "quality_filter_funnel",
    # SCD type-2 history materialization + as-of reconstruction +
    # out-of-order incremental maintenance through the streaming path
    "cdc_scd2_history", "scd2_as_of_state", "cdc_scd2_streamed",
    # Achlioptas ±1 Johnson-Lindenstrauss projection 64→16
    "embedding_sparse_projection",
    # per-label quantized centroids (k-means E-step aggregation shape)
    "label_centroids",
    # LEFT OUTER stream-stream join (watermark-driven null emission)
    "stream_stream_left_join_streamed",
    # quality-aware near-dup resolution (keep the best copy)
    "dedup_keep_best",
    # k-anonymity release audit over (lang, source) cells
    "k_anonymity_audit",
    # cross-doc duplicated-span stats over content-defined chunks
    "chunk_dedup_stats",
    # sliding window streamed twin (completes the A2 streamed family)
    "sliding_window_streamed",
    # freqItems heavy hitters — no-false-negative guarantee graded
    "heavy_hitters_sketch",
    # LSH S-curve: band-join recall vs ground-truth Jaccard pairs
    "minhash_recall_curve",
    # --- (3) stalest: latest grade is round 1 ---
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21",
    # (4) the oldest round-2 rows (derived_key, union_schemas,
    # keyed_count, route_demux, tokenize, upsert_sink_shape) and the
    # stale-but-green agg_stats / rollup_counts / set_ops /
    # window_lag_delta / customers_with_orders were dropped from the
    # window to make room for the round-5 additions above — every
    # dropped row is green in CORRECTNESS_r01/r02 and unchanged since.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

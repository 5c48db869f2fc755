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
# registration order. Cumulative coverage is complete: every query
# registered through round 5 has a driver CORRECTNESS row in some
# round (all green at their latest grade). Round-6 window policy
# (same rotation contract as r4/r5): (1) every query whose code path
# or oracle changed this round gets a fresh grade — the rewritten
# recall curve (df-capped ground truth + prefix-variant bands), the
# quantized sparse projection, the four consumers of the now-df-capped
# _JACCARD_PAIRS_CTE, and the four bigram queries over the renamed
# arrays_zip fields (value-identical, regraded anyway); (2) every
# round-6 addition; (3) the stalest rows — everything whose latest
# grade is round 1; (4) remaining slots to the oldest round-2 rows in
# registration order. Everything outside the window stays registered
# and locally verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path / oracle changed in round 6 → fresh grade ---
    # LSH S-curve: ground truth df-capped (broadcast anti-join) and
    # prefix-variant pairs populate all three J bands (r5 verdict #1/#2)
    "minhash_recall_curve",
    # floor-quantized exact-integer JL projection (midpoint-rounding fix)
    "embedding_sparse_projection",
    # _JACCARD_PAIRS_CTE consumers: shingle df-cap now applies family-wide
    "dedup_clusters", "dedup_clusters_star", "dedup_apply_fuzzy",
    "dedup_containment",
    # exploded_bigrams arrays_zip field naming made explicit (w1/w2)
    "top_bigrams", "bigram_logprob_by_source", "word_pmi_top",
    "doc_perplexity",
    # two-phase top-k rework (whole-group window sort removed)
    "hash_sample_per_group", "changelog_topk_per_group",
    "top_terms_by_source", "zipf_slope_by_source",
    # --- (2) new in round 6 ---
    # S4 through the engine's source API: spool-backed bus_upsert
    # readStream, two planned micro-batches, vs the direct pipeline
    "bus_roundtrip_streamed",
    # A1 through the two-phase salted aggregation (skew hardening)
    "count_live_by_salted",
    # skew-safe salted JOIN vs the plain-join oracle
    "salted_join_agg",
    # split by duplicate-cluster representative (no near-dup leakage)
    "cluster_safe_splits",
    # windowless hash-threshold mixture sampling (zero-shuffle form)
    "mixture_sample_hash",
    # per-source greedy best-docs-under-a-token-budget selection
    "token_budget_selection",
    # per-dimension symmetric INT8 corpus quantization
    "embedding_int8_quant",
    # FULL OUTER stream-stream join (both-sides watermark-driven
    # null emission; completes the inner/left/full graded family)
    "stream_stream_full_outer_streamed",
    # the bus topic as a SQL table: batch half of the source API
    "bus_table_compact",
    # --- (3) stalest: latest grade is round 1 ---
    "revenue_by_nation", "top_k_orders", "agg_stats", "rollup_counts",
    "set_ops", "window_lag_delta", "customers_with_orders", "tpch_q22",
    # --- (4) oldest round-2 rows, registration order ---
    "derived_key", "union_schemas", "keyed_count", "route_demux",
    "tokenize", "upsert_sink_shape", "sql_group_count",
    "grouped_count_alias", "tpch_q1", "tpch_q12", "token_count",
    "quality_score", "lang_id", "doc_fingerprint",
    "text_stats_by_source", "vocab_top_terms", "tfidf_top_terms",
    "similarity_topk", "embedding_stats",
    # Still outside the window, all last green in round 2 and
    # unchanged since (next rotation's front of the line):
    # similarity_topk_ivf (rows-only), multimodal_meta,
    # sliding_window, asof_join, pivot_counts, udaf_weighted_mean,
    # json_extract_props, percentile_by_type, cube_counts,
    # window_rank_family, embedding_norm_stats, pii_redact,
    # shard_assignment.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

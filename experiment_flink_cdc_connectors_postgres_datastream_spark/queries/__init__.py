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
# registered through round 6 has a driver CORRECTNESS row in some
# round (all green at their latest grade). Round-7 window policy
# (same rotation contract as r4-r6): (1) every query whose code path
# or oracle changed this round gets a fresh grade — the deterministic
# hash salts, the TRY_CAST keep-rate, the int8 zero guard, the
# interpolated curve CTE, and the name-based bus offsets; (2) the
# round-7 addition; (3) the 13 remaining round-2 rows (VERDICT r6
# directive #6 — after this round nothing's latest grade is older
# than round 3); (4) remaining slots to the oldest round-3 rows in
# registration order. Everything outside the window stays registered
# and locally verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path / oracle changed in round 7 → fresh grade ---
    # deterministic hash salts (retry-stable shuffles, ADVICE r6)
    "count_live_by_salted", "salted_join_agg",
    # TRY_CAST keep-rate / maxabs zero guard / interpolated VALUES CTE
    "mixture_sample_hash", "embedding_int8_quant", "minhash_recall_curve",
    # name-based spool offsets ({last, n} + count cross-check)
    "bus_roundtrip_streamed", "bus_table_compact",
    # --- (2) new in round 7 ---
    # the chunked keyset snapshot at sf scale through the source API
    "cdc_snapshot_chunked",
    # weighted sampling / DSIR curation / fuzzy decontamination /
    # incremental (crawl-snapshot) MinHash dedup through the engine /
    # hard-negative mining / repeat-factor class balancing
    "priority_sample_per_source", "dsir_importance_weights",
    "decontaminate_fuzzy", "decontaminate_spans",
    "dedup_minhash_streamed",
    "hard_negatives_topk", "repeat_factor_sampling",
    # --- (3) stalest: the 13 remaining round-2 rows (VERDICT r6 #6) ---
    "similarity_topk_ivf", "multimodal_meta", "sliding_window",
    "asof_join", "pivot_counts", "udaf_weighted_mean",
    "json_extract_props", "percentile_by_type", "cube_counts",
    "window_rank_family", "embedding_norm_stats", "pii_redact",
    "shard_assignment",
    # --- (4) oldest round-3 rows, registration order (22 of 36; the
    # round-7 additions displaced the rest — the displaced rows lead
    # the next-round rotation, named in the comment at the end) ---
    # (salted_agg_demo is also a round-7 regrade: it consumes the
    # reworked deterministic salt)
    "project_filter", "cdc_two_table_join", "customers_without_orders",
    "tokens_to_ids", "dedup_jaccard_prefix", "dedup_spans",
    "similarity_topk_lsh", "embedding_near_dup",
    "multimodal_feature_topk", "grouping_sets_count", "doc_chunking",
    "sequence_packing", "repetition_ratio", "length_band_filter",
    "interval_join_counts", "salted_agg_demo", "contamination_check",
    "train_val_test_split", "embedding_quantize_error",
    "type_token_ratio", "jsonl_roundtrip", "csv_roundtrip",
    # Still outside the window, all last green in round 3 and
    # unchanged since (next rotation's front of the line):
    # orc_roundtrip, tumbling_window_streamed, session_window_streamed,
    # dedup_streamed, stream_stream_join_streamed,
    # schema_merge_roundtrip, stream_static_join_streamed,
    # funnel_conversion, retention_cohorts, mixture_sample,
    # multi_resolution_rollup, word_entropy, zscore_outliers,
    # curation_pipeline.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

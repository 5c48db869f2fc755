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
# registration order. Cumulative coverage is complete: every
# registered query has a green driver CORRECTNESS row at its latest
# grade; the r10-r17 windows were all 50/50 green (the registry-wide
# rows-only count stays 3 by documented contract). Round-18 window
# policy (same rotation contract as r4-r17, shared graded helpers
# FROZEN after the round's first commit per VERDICT r11 #2):
# (1) every query whose code path changed since its last grade
# re-enters: the ADVICE-r17 statestore fix (savepoint()'s gen-0
# export now runs OUTSIDE the failure-cleanup handler, so a
# write-phase failure — the errorifexists race against a concurrent
# attempt's in-progress export, or a stranded partial appearing after
# the pre-check — propagates WITHOUT deleting anyone's data; the
# partial-gen-0 cleanup fires only for failures after this attempt's
# write completed. Failure-path-only — no behavior change on any
# successful commit or savepoint) pulls the same set the r15/r16/r17
# statestore changes did: the K3 sink row `upsert_sink_shape`, the
# ParquetUpsertSink-driven `cdc_scd2_streamed`, and the seven
# run_compacted_aggregate/statestore streamed wrappers:
# cdc_pipeline_streamed, bus_roundtrip_streamed,
# changelog_agg_multi_streamed, cdc_toast_pipeline_streamed,
# cdc_ttl_streamed, cdc_ttl_restart_streamed,
# cdc_ttl_wal2json_streamed — 9 regrades, 0 additions (≤ 15 per the
# freeze contract);
# (2) the 8 round-12 rows, the promised r18 front of the line — the
# rotation's stalest-row age bound moves to round 13;
# (3) remaining 33 slots take the round-13 rows A-Z (33 of the 39).
# Everything outside the window stays registered and locally
# verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path changed since the last grade: the ADVICE-r17
    # statestore savepoint fix (write-phase failures no longer delete
    # a concurrent attempt's gen-0; cleanup only after a completed
    # write, in streaming/statestore.py) pulls the K3 sink row, the
    # ParquetUpsertSink SCD2 stream, and every
    # run_compacted_aggregate wrapper ---
    "upsert_sink_shape", "cdc_scd2_streamed",
    "cdc_pipeline_streamed", "bus_roundtrip_streamed",
    "changelog_agg_multi_streamed", "cdc_toast_pipeline_streamed",
    "cdc_ttl_streamed", "cdc_ttl_restart_streamed",
    "cdc_ttl_wal2json_streamed",
    # --- (2) the 8 round-12 rows, the promised r18 front of the
    # line ---
    "sliding_window", "tfidf_top_terms", "token_budget_selection",
    "top_bigrams", "top_terms_by_source", "vocab_top_terms",
    "word_pmi_top", "zipf_slope_by_source",
    # --- (3) round-13 rows, 33 of the 39, A-Z ---
    "changelog_agg_multi", "changelog_diff", "compact_latest",
    "count_live_by", "count_live_by_salted", "csv_roundtrip",
    "cube_counts", "curation_pipeline", "customers_without_orders",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_streamed", "dup_degree_histogram",
    "embedding_matryoshka", "funnel_conversion",
    "grouping_sets_count", "interval_join_counts",
    "json_extract_props", "jsonl_roundtrip", "length_band_filter",
    "multimodal_feature_topk", "multimodal_meta", "orc_roundtrip",
    "percentile_by_type", "pivot_counts", "repetition_ratio",
    "retention_cohorts", "session_window_streamed",
    "shard_assignment", "stream_static_join_streamed",
    "stream_stream_join_streamed",
    # Still outside the window, last green in round 13, displaced to
    # the FRONT of the r19 rotation: tokens_to_ids,
    # train_val_test_split, tumbling_window_streamed,
    # type_token_ratio, udaf_weighted_mean, window_rank_family.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

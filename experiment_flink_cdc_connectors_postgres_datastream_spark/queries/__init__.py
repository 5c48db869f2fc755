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
# grade; the r10-r15 windows were all 50/50 green (the registry-wide
# rows-only count stays 3 by documented contract). Round-16 window
# policy (same rotation contract as r4-r15, shared graded helpers
# FROZEN after the round's first commit per VERDICT r11 #2):
# (1) every query whose code path changed since its last grade
# re-enters: the ADVICE-r15 statestore hardening (commit() now fails
# loudly on a NULL/non-integer `_bucket` partition instead of
# silently orphaning its rows, and validates the committed column
# name/type set against the manifest's recorded schema so drift can
# never mistype a pruned empty read — both in
# streaming/statestore.py, no behavior change on any valid commit)
# pulls the same set the r15 statestore fix did: the K3 sink row
# `upsert_sink_shape`, the ParquetUpsertSink-driven
# `cdc_scd2_streamed`, and the seven
# run_compacted_aggregate/statestore streamed wrappers (all r15):
# cdc_pipeline_streamed, bus_roundtrip_streamed,
# changelog_agg_multi_streamed, cdc_toast_pipeline_streamed,
# cdc_ttl_streamed, cdc_ttl_restart_streamed,
# cdc_ttl_wal2json_streamed — 9 regrades, 0 additions (≤ 15 per the
# freeze contract);
# (2) the 10 round-10 TPC-H rows, the promised r16 front of the
# line — the rotation's stalest-row age bound moves to round 11;
# (3) remaining 31 slots take the round-11 rows alphabetically.
# Everything outside the window stays registered and locally
# verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path changed since the last grade: the ADVICE-r15
    # statestore commit hardening (non-int `_bucket` partition guard +
    # committed-schema drift validation in streaming/statestore.py)
    # pulls the K3 sink row, the ParquetUpsertSink SCD2 stream, and
    # every run_compacted_aggregate wrapper ---
    "upsert_sink_shape", "cdc_scd2_streamed",
    "cdc_pipeline_streamed", "bus_roundtrip_streamed",
    "changelog_agg_multi_streamed", "cdc_toast_pipeline_streamed",
    "cdc_ttl_streamed", "cdc_ttl_restart_streamed",
    "cdc_ttl_wal2json_streamed",
    # --- (2) the 10 round-10 TPC-H rows, the promised r16 front of
    # the line ---
    "tpch_q2", "tpch_q20", "tpch_q21", "tpch_q3", "tpch_q4",
    "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9",
    # --- (3) round-11 rows, 31 of the 40, A-Z ---
    "agg_stats", "cdc_toast_wal2json", "chunk_dedup_stats",
    "content_defined_chunks", "customers_with_orders",
    "dedup_apply_fuzzy", "dedup_clusters", "dedup_clusters_star",
    "dedup_containment", "dedup_minhash_streamed", "derived_key",
    "doc_fingerprint", "doc_perplexity", "gopher_quality_flags",
    "grouped_count_alias", "k_anonymity_audit", "keyed_count",
    "lang_id", "quality_filter_funnel", "quality_score",
    "revenue_by_nation", "rollup_counts", "route_demux", "set_ops",
    "similarity_topk", "sliding_window_streamed", "sql_group_count",
    "stream_stream_full_outer_streamed",
    "stream_stream_left_join_streamed", "text_stats_by_source",
    "tfidf_cosine_pairs",
    # Still outside the window, last green in round 11, displaced to
    # the FRONT of the r17 rotation: token_count, tokenize,
    # tokenizer_coverage, top_k_orders, tpch_q1, tpch_q12, tpch_q22,
    # union_schemas, window_lag_delta.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

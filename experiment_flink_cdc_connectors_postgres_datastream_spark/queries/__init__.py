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
# grade; the r10-r16 windows were all 50/50 green (the registry-wide
# rows-only count stays 3 by documented contract). Round-17 window
# policy (same rotation contract as r4-r16, shared graded helpers
# FROZEN after the round's first commit per VERDICT r11 #2):
# (1) every query whose code path changed since its last grade
# re-enters: the ADVICE-r16 statestore polish (savepoint() now
# best-effort deletes a partial gen-0 when the export fails after the
# write began — guarded on manifest-0.json NOT existing — and
# pre-checks for a stranded partial gen-0 with a friendly message;
# the schema-drift guard's error text now states the sanctioned
# migration recipe. Failure-path/message-only — no behavior change
# on any successful commit or savepoint) pulls the same set the
# r15/r16 statestore changes did: the K3 sink row `upsert_sink_shape`,
# the ParquetUpsertSink-driven `cdc_scd2_streamed`, and the seven
# run_compacted_aggregate/statestore streamed wrappers:
# cdc_pipeline_streamed, bus_roundtrip_streamed,
# changelog_agg_multi_streamed, cdc_toast_pipeline_streamed,
# cdc_ttl_streamed, cdc_ttl_restart_streamed,
# cdc_ttl_wal2json_streamed — 9 regrades, 0 additions (≤ 15 per the
# freeze contract);
# (2) the 9 round-11 rows, the promised r17 front of the line — the
# rotation's stalest-row age bound moves to round 12;
# (3) remaining 32 slots take the round-12 rows A-Z (32 of the 40).
# Everything outside the window stays registered and locally
# verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path changed since the last grade: the ADVICE-r16
    # statestore polish (savepoint partial-gen-0 cleanup + drift-guard
    # remediation text in streaming/statestore.py) pulls the K3 sink
    # row, the ParquetUpsertSink SCD2 stream, and every
    # run_compacted_aggregate wrapper ---
    "upsert_sink_shape", "cdc_scd2_streamed",
    "cdc_pipeline_streamed", "bus_roundtrip_streamed",
    "changelog_agg_multi_streamed", "cdc_toast_pipeline_streamed",
    "cdc_ttl_streamed", "cdc_ttl_restart_streamed",
    "cdc_ttl_wal2json_streamed",
    # --- (2) the 9 round-11 rows, the promised r17 front of the
    # line ---
    "token_count", "tokenize", "tokenizer_coverage", "top_k_orders",
    "tpch_q1", "tpch_q12", "tpch_q22", "union_schemas",
    "window_lag_delta",
    # --- (3) round-12 rows, 32 of the 40, A-Z ---
    "asof_join", "bigram_logprob_by_source", "bpe_learn_merges",
    "bpe_pair_counts", "changelog_topk_per_group",
    "cluster_safe_splits", "contamination_check",
    "decontaminate_fuzzy", "decontaminate_spans",
    "dedup_jaccard_prefix", "dedup_spans", "doc_chunking",
    "dsir_importance_weights", "embedding_int8_quant",
    "embedding_near_dup", "embedding_norm_stats",
    "embedding_quantize_error", "embedding_sparse_projection",
    "embedding_stats", "hash_sample_per_group",
    "minhash_recall_curve", "pii_redact",
    "priority_sample_per_source", "project_filter",
    "repeat_factor_sampling", "sequence_packing",
    "similarity_topk_ivf", "similarity_topk_ivf_sampled",
    "similarity_topk_lsh", "similarity_topk_pq",
    "similarity_topk_pq_sampled", "similarity_topk_pq_sampled_rerank",
    # Still outside the window, last green in round 12, displaced to
    # the FRONT of the r18 rotation: sliding_window, tfidf_top_terms,
    # token_budget_selection, top_bigrams, top_terms_by_source,
    # vocab_top_terms, word_pmi_top, zipf_slope_by_source.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

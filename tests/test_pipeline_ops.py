"""Pipeline-shaping operators: chunking reconstruction, packing
invariants, banded interval join vs the naive range join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.chunking import chunk_documents, pack_sequences
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.temporal import interval_join
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import repetition_features

from soakopt import soak_examples


def test_chunking_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_size=32, overlap=8).collect()
    # stride 24 over 100 tokens -> starts 1,25,49,73,97 -> 5 chunks
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2, 3, 4]
    assert [c["n_tokens"] for c in chunks] == [32, 32, 32, 28, 4]
    # consecutive chunks share exactly the 8-token overlap
    a, b = chunks[0]["chunk_text"].split(), chunks[1]["chunk_text"].split()
    assert a[-8:] == b[:8]
    # every token appears in some chunk
    seen = {t for c in chunks for t in c["chunk_text"].split()}
    assert len(seen) == 100


def test_packing_respects_budget_and_keeps_every_doc(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + (i * 37) % 90))) for i in range(200)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=128, n_groups=8).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(200))   # nothing lost
    fills: dict[int, int] = {}
    for r in out:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    for b, total in fills.items():
        assert total <= 128, f"bin {b} overflows: {total}"
    # bin_fill column agrees with the recomputed totals
    for r in out:
        assert fills[r["bin_id"]] == r["bin_fill"]


def test_packing_group_count_scales_with_input(spark):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.chunking import derive_pack_groups

    # floor: cluster parallelism (no idle cores on small corpora)
    assert derive_pack_groups(500, parallelism=32) == 32
    # scale: one group per rows_per_group beyond the floor — a 10B-row
    # corpus gets 10k greedy tasks, not a fixed 32-task cap
    assert derive_pack_groups(10_000_000_000, parallelism=32) == 10_000
    assert derive_pack_groups(2_500_000, parallelism=2, rows_per_group=1_000_000) == 3
    # derived path runs end to end and still keeps every doc
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=16, rows_per_group=10).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(50))


def test_packing_oversized_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 500)), (2, "a b"), (3, "c d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, budget=100, n_groups=1).collect()}
    assert out[1]["bin_fill"] == 500            # alone, over budget
    others = {out[2]["bin_id"], out[3]["bin_id"]}
    assert out[1]["bin_id"] not in others


def test_interval_join_matches_naive_range_join(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(5), rng.randrange(0, 10_000_000)) for i in range(300)]
    df = spark.createDataFrame(rows, "eid long, k long, us long").select(
        "eid", "k", F.timestamp_micros("us").alias("ts")
    )
    lo, hi = 100_000, 1_500_000
    got = {
        (r["eid"], r["eid_r"])
        for r in interval_join(
            df, df.select(F.col("eid").alias("eid"), "k", "ts"), ["k"], "ts", "ts", lo, hi
        ).collect()
    }
    naive = {
        (a, b)
        for a, ka, ua in rows
        for b, kb, ub in rows
        if ka == kb and ua + lo <= ub <= ua + hi
    }
    assert got == naive and naive  # non-empty and identical


def test_repetition_ratio_bounds_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "all distinct words here now"), (3, "x y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_features(docs, n=3).collect()}
    assert out[1]["repetition_ratio"] > 0.5          # degenerate repetition
    assert out[2]["repetition_ratio"] == 0.0         # all trigrams unique
    assert out[3]["n_ngrams"] == 0 and out[3]["repetition_ratio"] == 0.0


def test_gopher_quality_known_doc(spark):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import gopher_quality

    # 8 words: "the" twice (top1 2/8), one pure-symbol token, sum of
    # word lengths hand-computed below
    text = "the cat sat with the dog ### today..."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_quality(docs).collect()[0]
    assert r["n_words"] == 8
    toks = text.lower().split()
    assert r["mean_word_len"] == sum(len(w) for w in toks) / 8
    assert r["alpha_frac"] == 7 / 8          # "###" has no letter
    assert r["stop_hits"] == 2               # the, with
    assert r["top1_frac"] == 2 / 8           # "the" twice
    # 3 '#' chars + 1 non-overlapping '...' = 4 symbols over 8 words
    assert r["symbol_ratio"] == 4 / 8
    assert not r["keep_gopher"]              # fails word count + symbol


def test_gopher_keep_flag_thresholds(spark):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import gopher_quality

    # 60 distinct-ish words incl. >=2 stopwords, all alphabetic ->
    # passes every rule
    words = ["the", "of"] + [f"word{i:02d}" for i in range(58)]
    good = " ".join(words)
    docs = spark.createDataFrame(
        [(1, good), (2, "short doc")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert rows[1]["keep_gopher"]
    assert not rows[2]["keep_gopher"]


def test_quality_filter_funnel_charges_first_failing_rule(spark, tmp_path):
    # funnel counts must sum to the corpus size, and every charged
    # stage must be the doc's FIRST failing rule by construction
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

    out = QUERIES["quality_filter_funnel"](spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_docs"] for r in out) == 500
    assert all(1 <= r["stage_idx"] <= 7 for r in out)


def test_scd2_history_intervals(spark):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import scd2_history

    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        (2, 5, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, v string")
    out = {(r["k"], r["seq"]): r for r in scd2_history(df, ["k"], ["seq"]).collect()}
    assert out[(1, 10)]["valid_to"] == 20 and not out[(1, 10)]["is_current"]
    assert out[(1, 20)]["valid_to"] == 30
    assert out[(1, 30)]["valid_to"] is None and out[(1, 30)]["is_current"]
    assert out[(2, 5)]["is_current"]
    # exactly one current row per key; intervals chain without gaps
    cur = [r for r in out.values() if r["is_current"]]
    assert sorted(r["k"] for r in cur) == [1, 2]


def test_sparse_projection_numpy_golden(spark):
    import numpy as np

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.similarity_ops import (
        _PROJ_D,
        _PROJ_K,
        _proj_signs,
        embedding_sparse_projection,
    )

    out = embedding_sparse_projection(spark, "/root/testdata/sf0.001")
    got = {r["vec_id"]: r for r in out.take(5)}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id").isin(*got.keys()))
        .collect()
    }
    S = np.array([_proj_signs(i) for i in range(_PROJ_K)])  # (16, 64)
    for vid, r in got.items():
        # mirror the engine's definition exactly: floor-quantize each
        # element to 1e-6 BIGINT, exact integer dot, divide by 4e6
        want = (S @ np.floor(emb[vid] * 1_000_000.0)) / 4_000_000.0
        for i in range(_PROJ_K):
            assert r[f"p{i:02d}"] == want[i], (vid, i)


def test_scd2_as_of_equals_prefix_compaction(spark):
    """The SCD2 as-of law: interval containment at instant T must
    reconstruct exactly compact_latest() over the changelog prefix
    ts <= T (including same-timestamp ties broken by event_id)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import compact_latest
    from experiment_flink_cdc_connectors_postgres_datastream_spark.io import load_table
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    asof = QUERIES["scd2_as_of_state"](spark, sf)
    ev = load_table(spark, sf, "events").filter(F.col("ts") <= t)
    compacted = compact_latest(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value"
    )
    assert asof.exceptAll(compacted).count() == 0
    assert compacted.exceptAll(asof).count() == 0
    assert asof.count() > 0


def test_label_centroids_known_vectors(spark):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.similarity_ops import label_centroids

    # centroid of [1.0, -0.5] and [2.0, 0.5] is quantized-exact
    # (1e6 multiples)
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5], 7), (2, [2.0, 0.5], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    emb.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    out = {r["pos"]: r for r in label_centroids(spark, tmp).collect()}
    assert out[0]["n_vecs"] == 2 and out[0]["sum_q"] == 3_000_000
    assert out[0]["centroid_q"] == 1_500_000.0
    assert out[1]["sum_q"] == 0 and out[1]["centroid_q"] == 0.0


# --- hypothesis: gopher battery vs an independent Python reference ---

from hypothesis import given, settings, strategies as st

_WORDS = st.lists(
    st.sampled_from(
        ["the", "of", "with", "###", "a...b", "word", "Spark", "x1", "...", "zz"]
    ),
    min_size=1,
    max_size=30,
)


def _py_gopher(text: str) -> dict:
    toks = text.lower().split()
    n = len(toks)
    import re as _re

    counts: dict[str, int] = {}
    for w in toks:
        counts[w] = counts.get(w, 0) + 1
    return {
        "n_words": n,
        "mean_word_len": sum(len(w) for w in toks) / n,
        "alpha_frac": sum(1 for w in toks if _re.search("[a-z]", w)) / n,
        "stop_hits": sum(
            1
            for s in ["the", "be", "to", "of", "and", "that", "have", "with"]
            if s in toks
        ),
        "top1_frac": max(counts.values()) / n,
        "symbol_ratio": (text.count("#") + len(_re.findall(r"\.\.\.", text))) / n,
    }


@settings(max_examples=soak_examples(10), deadline=None)
@given(docs=st.lists(_WORDS, min_size=1, max_size=6))
def test_gopher_matches_python_reference(spark, docs):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import gopher_quality

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    for i, text in rows:
        want = _py_gopher(text)
        for k, v in want.items():
            assert got[i][k] == v, (k, text, got[i][k], v)


@settings(max_examples=soak_examples(10), deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 5)),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1], r[2]),
    )
)
def test_scd2_partitions_each_keys_timeline(spark, rows):
    """SCD2 law: per key, ordered intervals chain exactly — each row's
    valid_to equals the next row's valid_from, exactly one open
    (current) interval per key, and valid_from never exceeds its own
    valid_to."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import scd2_history

    df = spark.createDataFrame(
        [(k, s, t) for k, s, t in rows], "k long, seq long, tb long"
    )
    out = scd2_history(df, ["k"], ["seq", "tb"]).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: (r["seq"], r["tb"]))
        assert sum(1 for r in rs if r["is_current"]) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], (k, a, b)
            assert a["valid_from"] <= a["valid_to"]


def test_priority_sample_invariants(spark):
    """Priority-sampling laws on the sf0.001 fixture: per source the
    sample has min(8, n_docs) members drawn from that source, reruns
    are identical (hash-derived priorities), and for a source whose
    docs ALL fit in the sample the estimator equals the exact total
    (tau = 0 degenerates max(w, tau) to w)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r["source"]: r for r in QUERIES["priority_sample_per_source"](spark, sf).collect()}
    sizes = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rows) == set(sizes)
    for src, r in rows.items():
        assert r["n_sampled"] == min(8, sizes[src]), (src, r)
        # estimator never undershoots the sampled mass; exact when
        # the whole source fits
        if sizes[src] <= 8:
            assert r["est_weight"] == float(r["exact_weight"]), r
    again = {r["source"]: r for r in QUERIES["priority_sample_per_source"](spark, sf).collect()}
    assert {s: r["sample_id_checksum"] for s, r in rows.items()} == {
        s: r["sample_id_checksum"] for s, r in again.items()
    }


def test_dsir_weights_favor_target_language(spark):
    """DSIR sanity: documents IN the target slice (lang='en') must
    score a higher mean importance log-weight than documents outside
    it — the direction the resampler depends on."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

    out = QUERIES["dsir_importance_weights"](spark, "/root/testdata/sf0.001")
    means = {
        r["is_en"]: r["m"]
        for r in out.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg(F.col("log_w_micro")).alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_decontaminate_fuzzy_finds_every_origin_doc(spark):
    """Containment law: every eval item is a token prefix of its
    origin document, so the origin doc must appear in the removal
    list with max_containment = 1.0 (each prefix trigram is a
    trigram of the full text; the hot-shingle cap drops the same
    shingles from both sides)."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    flagged = {
        r["doc_id"]: r for r in QUERIES["decontaminate_fuzzy"](spark, sf).collect()
    }
    toks = F.split(F.lower(F.col("text")), r"\s+")
    eval_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .filter((F.col("doc_id") % 37 == 0) & (F.size(toks) >= 12))
        .collect()
    ]
    assert eval_ids, "fixture must contain eval-slice docs"
    for eid in eval_ids:
        assert eid in flagged, (eid, sorted(flagged))
        assert flagged[eid]["max_containment"] == 1.0, flagged[eid]


def test_mixture_sample_suffix_fallback_fires_under_ansi(spark):
    """ADVICE r7: mixture_sample_hash's keep-rate suffix parse must use
    try_cast — under Spark 4's default ANSI mode a plain .cast('int')
    THROWS on a source whose numeric suffix is empty/non-numeric (e.g.
    a 3-char source), making the documented LENGTH fallback unreachable
    while the DuckDB oracle's TRY_CAST succeeds (engine divergence).
    Pin the exact expression: non-numeric suffixes take the length
    fallback, numeric ones parse."""
    df = spark.createDataFrame(
        [("web",), ("cc-2021",), ("srcXY",)], "source string"
    ).select(
        "source",
        F.coalesce(
            F.substring(F.col("source"), 4, 10).try_cast("int"), F.length("source")
        ).alias("suffix"),
    )
    got = {r["source"]: r["suffix"] for r in df.collect()}
    assert got == {"web": 3, "cc-2021": 2021, "srcXY": 5}


def test_temperature_mixture_sqrt_flattening(spark, tmp_path):
    """Alpha=0.5 flattening: a source with 4x the tokens gets only 2x
    the weight; ppm weights are exact integers that sum to <= 1e6."""
    rows = [(i, "w " * (99 if i < 10 else 399), "big" if i >= 10 else "small")
            for i in range(20)]
    # cross-engine token-count parity is the oracle's job; this test
    # pins only the flattening ratio, which a constant off-by-one in
    # the split convention cannot affect.
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.pipeline_ops import temperature_mixture_weights

    out = {r["source"]: r for r in temperature_mixture_weights(spark, str(tmp_path)).collect()}
    assert out["big"]["total_tokens"] == 4 * out["small"]["total_tokens"]
    # sqrt: ~2x the sampling weight despite 4x the tokens (up to the
    # one-micro-unit floor quantization)
    assert abs(out["big"]["sqrt_micro"] - 2 * out["small"]["sqrt_micro"]) <= 1
    assert sum(r["weight_ppm"] for r in out.values()) <= 1_000_000


def test_isqrt_family_excludes_zero_token_sources(spark, tmp_path):
    """Degenerate input the fixtures never produce: a source whose
    total_tokens is NULL/zero (all-NULL text). Before the guard,
    sqrt_micro = 0 reached division — DuckDB errors on integer // 0
    while Spark's div returns NULL (and a NULL vtime sorts opposite
    ways in the two engines). Both engines must now agree: the source
    is excluded, every other row unchanged."""
    import duckdb

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import ORACLES
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.pipeline_ops import (
        mixture_budget_allocation,
        mixture_interleave_schedule,
        temperature_mixture_weights,
    )

    rows = [(i, "w " * (i + 1), "ok_a" if i % 2 else "ok_b") for i in range(10)]
    rows += [(100 + i, None, "ghost") for i in range(3)]  # tokenizes to NULL
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    for name, fn in [
        ("temperature_mixture_weights", temperature_mixture_weights),
        ("mixture_budget_allocation", mixture_budget_allocation),
        ("mixture_interleave_schedule", mixture_interleave_schedule),
    ]:
        sdf = fn(spark, str(tmp_path))
        srows = sorted(tuple(r) for r in sdf.collect())
        drows = sorted(tuple(r) for r in con.sql(ORACLES[name]).fetchall())
        assert srows == drows, name
        assert srows, name  # the live sources still produce output
        src_idx = sdf.columns.index("source")
        assert all(r[src_idx] != "ghost" for r in srows), name


def test_quality_logreg_score_hand_computed(spark, tmp_path):
    """The linear gate scores w.x exactly: hand-computed milli-score
    for a two-doc corpus."""
    rows = [
        (0, "good doc with many distinct words", "s"),   # 6 tok, 6 typ, 33 chr, 0 dig
        (1, "1 1 1 1", "s"),                              # 4 tok, 1 typ, 7 chr, 4 dig
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.pipeline_ops import (
        QUALITY_BIAS,
        QUALITY_W_CHAR,
        QUALITY_W_DIGIT,
        QUALITY_W_TOKEN,
        QUALITY_W_TYPE,
        quality_logreg_score,
    )

    s0 = QUALITY_W_TOKEN * 6 + QUALITY_W_TYPE * 6 + QUALITY_W_CHAR * 33 + QUALITY_BIAS
    s1 = QUALITY_W_TOKEN * 4 + QUALITY_W_TYPE * 1 + QUALITY_W_CHAR * 7 + QUALITY_W_DIGIT * 4 + QUALITY_BIAS
    row = quality_logreg_score(spark, str(tmp_path)).first()
    assert row["n_docs"] == 2
    assert row["score_checksum"] == s0 + s1
    assert row["n_pass"] == int(s0 > 0) + int(s1 > 0)


def test_recency_decay_halves_per_week(spark, tmp_path):
    """Weights halve per whole week of age vs the newest event; ages
    >= 40 weeks clamp to weight 0 (1e6 >> 40)."""
    import datetime

    t0 = datetime.datetime(2024, 6, 1)

    def ev(eid, days_old, etype):
        return (eid, etype, t0 - datetime.timedelta(days=days_old))

    rows = [
        ev(1, 0, "a"),    # newest: k=0 -> 1_000_000
        ev(2, 8, "a"),    # 1 week old -> 500_000
        ev(3, 15, "b"),   # 2 weeks -> 250_000
        ev(4, 290, "b"),  # 41 weeks -> clamped shift 40 -> 0
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    df.write.parquet(str(tmp_path / "events.parquet"))

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.pipeline_ops import recency_decay_weights

    out = {r["event_type"]: r for r in recency_decay_weights(spark, str(tmp_path)).collect()}
    assert out["a"]["replay_weight_sum"] == 1_000_000 + 500_000
    assert out["b"]["replay_weight_sum"] == 250_000 + 0
    assert out["a"]["n_events"] == 2 and out["b"]["n_events"] == 2


def test_isqrt_micro_sql_exact_on_both_engines(spark):
    """The ±3-window integer-sqrt correction (`_isqrt_micro_sql`) must
    equal math.isqrt(n·10¹²) exactly — brute-forced over adversarial
    token counts (perfect squares of the micro grid, off-by-one
    neighbors, primes, and values where floor(float-sqrt) rounds the
    wrong way) on BOTH engines."""
    import math

    import duckdb

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.pipeline_ops import _isqrt_micro_sql

    # adversarial n: perfect squares in micro units land exactly on
    # the grid; 4503599761588224 = (2**26 + 1)**2 / 4-ish float-error
    # magnet; large primes; the float-sqrt double-rounding zone ~1e15
    ns = [0, 1, 2, 3, 4, 999, 1000, 10**6, 10**6 + 1,
          4503599761588223, 4503599761588224, 4503599761588225,
          10**15 - 1, 10**15, 10**15 + 1, 2**52 + 1, 999999999999989]
    want = {n: math.isqrt(n * 10**12) for n in ns}

    con = duckdb.connect()
    con.execute("CREATE TABLE s(total_tokens BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", [(n,) for n in ns])
    duck = dict(
        con.sql(
            "WITH g AS (SELECT total_tokens, GREATEST(CAST(FLOOR(SQRT(CAST(total_tokens AS DOUBLE)) * 1000000) AS BIGINT) - 3, CAST(0 AS BIGINT)) AS base FROM s) "
            f"SELECT total_tokens, CAST({_isqrt_micro_sql('HUGEINT')} AS BIGINT) FROM g"
        ).fetchall()
    )
    assert duck == want

    df = spark.createDataFrame([(n,) for n in ns], "total_tokens long")
    g = df.selectExpr(
        "total_tokens",
        "GREATEST(CAST(FLOOR(SQRT(CAST(total_tokens AS DOUBLE)) * 1000000) AS BIGINT) - 3, CAST(0 AS BIGINT)) AS base",
    )
    got = {
        r[0]: r[1]
        for r in g.selectExpr(
            "total_tokens", f"CAST({_isqrt_micro_sql('DECIMAL(38,0)')} AS BIGINT)"
        ).collect()
    }
    assert got == want

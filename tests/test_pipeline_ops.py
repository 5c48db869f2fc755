"""Pipeline-shaping operators: chunking reconstruction, packing
invariants, banded interval join vs the naive range join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.chunking import chunk_documents, pack_sequences
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.temporal import interval_join
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import repetition_features


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

"""Corpus-audit operators: bigram extraction, int8 quantization error
bounds, L2 norms — small constructed inputs with known answers."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.similarity import (
    int8_quantize_error,
    l2_norm,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.text import bigrams, tokens


def test_bigrams_adjacent_pairs_and_short_inputs(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("solo",), ("x y",)], "text string"
    )
    rows = df.select(bigrams(tokens(F.col("text"))).alias("bg")).collect()
    assert rows[0]["bg"] == ["a b", "b c", "c d"]
    assert rows[1]["bg"] == []
    assert rows[2]["bg"] == ["x y"]


def test_l2_norm_known_value(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v array<float>")
    assert df.select(l2_norm(F.col("v")).alias("n")).first()["n"] == 5.0


def test_int8_quantize_error_bounded_by_half_scale(spark):
    vec = [0.9, -0.3, 0.11, 0.0, -0.77, 0.5]
    df = spark.createDataFrame([(vec,)], "v array<float>")
    err = df.select(int8_quantize_error(F.col("v")).alias("e")).first()["e"]
    # per-element error of round-to-nearest is <= scale/2
    scale = max(abs(x) for x in vec) / 127.0
    assert 0.0 <= err <= scale / 2 + 1e-12
    # cross-check against a python reference
    ref = sum(
        abs(x - math.floor(x / scale + 0.5) * scale) for x in vec
    ) / len(vec)
    assert abs(err - ref) < 1e-6


def test_int8_quantize_error_null_for_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "v array<float>")
    assert df.select(int8_quantize_error(F.col("v")).alias("e")).first()["e"] is None

"""Banded interval join: match left rows to right rows of the same key
whose timestamp falls in ``[l.ts + lower, l.ts + upper]`` — the
"events within Δ of each other" primitive (sibling of the as-of join,
:mod:`.asof`).

The naive formulation is an equi-join on the key with a range
predicate, which Spark executes as a sort-merge join keyed on the key
alone — every same-key pair is generated before the range filter
prunes, quadratic in per-key row count. The scalable formulation here
is time-bucketing: quantize time into bins of width = (upper - lower),
explode each LEFT row to the 2-3 bins its window can overlap, and
equi-join on (key, bin) with a residual range filter. Join fan-out is
bounded by actual temporal co-location, not per-key cardinality; the
shuffle key (key, bin) also breaks up hot keys across time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    suffix: str = "_r",
) -> DataFrame:
    """Inner interval join on microsecond timestamps (TimestampType
    columns are converted via ``unix_micros``). Output: all left
    columns + right non-key columns suffixed. Requires upper > lower.
    """
    if upper_us <= lower_us:
        raise ValueError(f"need upper_us > lower_us, got [{lower_us}, {upper_us}]")
    width = upper_us - lower_us
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    rcols = [c for c in right.columns if c not in key_cols]
    r_binned = right.select(
        *key_cols,
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.floor(r_us / width).alias("_bin"),
    )
    # a left row's window [l+lower, l+upper] spans exactly width, so it
    # overlaps at most 2 bins; sequence() covers boundary cases
    l_binned = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lower_us)) / width),
                F.floor((l_us + F.lit(upper_us)) / width),
            )
        ).alias("_bin"),
    )
    l_us_j = F.unix_micros(F.col(left_ts))
    r_us_j = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    # no post-join dedup needed: a right row lives in exactly one bin
    # and the left explode emits each bin once, so every qualifying
    # (left, right) pair joins exactly once
    return (
        l_binned.join(r_binned, [*key_cols, "_bin"])
        .filter(
            (r_us_j >= l_us_j + F.lit(lower_us)) & (r_us_j <= l_us_j + F.lit(upper_us))
        )
        .drop("_bin")
    )

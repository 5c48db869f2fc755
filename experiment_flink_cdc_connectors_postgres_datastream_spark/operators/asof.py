"""As-of join: match each left row to the most recent right row with
``right.ts <= left.ts`` within the same key — the temporal-join
primitive Spark lacks as a built-in.

Scalable formulation (no per-row range probe, no inequality
cross-join): union both sides tagged, single window pass per key
ordered by (ts, side) carrying the right side's payload forward with
``last_value(ignorenulls)``, keep left rows. One shuffle on the key —
identical distribution cost to an equi-join, so it survives 100 TB.
DuckDB's native ``ASOF JOIN`` serves as the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Columns: all left columns + right value columns (suffixed) +
    ``{ts_col}{suffix}`` (the matched right timestamp; null when no
    right row precedes the left row).

    Ties (equal timestamps) match — the right row at exactly
    ``left.ts`` is visible, like DuckDB ASOF's ``>=`` semantics.
    """
    rvals = right_value_cols or [c for c in right.columns if c not in key_cols and c != ts_col]
    lcols = left.columns
    l_tag = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in key_cols and c != ts_col],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in rvals],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{ts_col}{suffix}"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols and c != ts_col],
        *[F.col(c).alias(f"{c}{suffix}") for c in rvals],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    # right rows sort before left rows at equal ts (side 0 < 1) so a
    # same-timestamp right row is already visible to the left row
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in [*rvals, ts_col]
        ],
    )
    out_cols = (
        [F.col(c) for c in lcols]
        + [F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in rvals]
        + [F.col(f"_f_{ts_col}").alias(f"{ts_col}{suffix}")]
    )
    return filled.filter(F.col("_side") == 1).select(*out_cols)

"""Streaming changelog materialization: the continuous analog of
``cdc.changelog`` (SURVEY.md §2.3 A1/A3).

Two strategies, both exactly-once with a checkpoint location:

1. ``stream_compact_latest`` — per-key latest-row state via
   ``applyInPandasWithState`` (update-mode stream of changed latest
   rows). State is partitioned by the upsert key — the same hash
   shuffle the reference's ``keyBy``
   (StreamingJobWithCustomDeserializer.java:83) implies — and never
   expires, matching the reference's idle-state-retention-0 config
   (sql-client-conf.yaml:16-17).

2. ``run_compacted_aggregate`` — ``foreachBatch``: merge each
   micro-batch into a compacted state table (parquet), recompute the
   grouped aggregate, and hand the refreshed aggregate to a sink
   callback (our JDBC-upsert path, K3). Per-batch recompute of the
   *aggregate* is cheap because the state table holds one row per
   live key; the merge itself is incremental.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import DELETE_OP, compact_latest


def stream_compact_latest(
    df: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str | None = None,
) -> DataFrame:
    """Continuous latest-per-key compaction over a CDC stream.

    Emits, per micro-batch, the new latest row of every key that
    changed (update-mode changelog of the materialized upsert table).
    Tombstones: when the latest event for a key has op 'd', the key's
    row is emitted with ``_live = false`` so downstream can retract;
    live rows carry ``_live = true``.
    """
    out_schema = StructType.fromJson(df.schema.jsonValue())
    out_schema = out_schema.add("_live", "boolean")
    state_schema = StructType.fromJson(df.schema.jsonValue())
    cols = df.columns

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            prev = pd.DataFrame([tuple(state.get)], columns=cols)
            # stable sort puts the restored state first so an equal seq
            # from the new batch wins (arrival order within a batch)
            batch = pd.concat([prev, batch], ignore_index=True)
        batch = batch.sort_values(seq_cols, kind="mergesort")
        latest = batch.iloc[-1]
        state.update(tuple(latest[c] for c in cols))
        out = pd.DataFrame([tuple(latest[c] for c in cols)], columns=cols)
        out["_live"] = bool(op_col is None or latest[op_col] != DELETE_OP)
        yield out

    return df.groupBy(*[F.col(k) for k in key_cols]).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_compacted_aggregate(
    stream: DataFrame,
    state_dir: str,
    key_cols: list[str],
    seq_cols: list[str],
    group_cols: list[str],
    op_col: str | None = None,
    count_alias: str = "user_count",
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "compacted_aggregate",
):
    """The reference's full stage-2 (upsert table → GROUP BY count →
    JDBC upsert, StreamingJobWithCustomDeserializer.java:156-194) as a
    foreachBatch pipeline over parquet state.

    Each micro-batch: state ∪ batch → compact_latest → overwrite state
    → changelog-correct aggregate → ``sink(agg_df, batch_id)``.
    Restart-safe: the checkpoint tracks source progress and the merge
    is idempotent (last-write-wins by seq).
    """
    spark = stream.sparkSession
    state_path = os.path.join(state_dir, "state")
    tmp_path = os.path.join(state_dir, "state_next")

    def process(batch: DataFrame, batch_id: int) -> None:
        new = batch
        if os.path.exists(state_path):
            prev = spark.read.parquet(state_path)
            new = prev.unionByName(batch)
        compacted = compact_latest(new, key_cols, seq_cols, op_col=op_col, drop_deletes=False)
        # two-phase overwrite: never read and write the same path in one job
        compacted.write.mode("overwrite").parquet(tmp_path)
        fresh = spark.read.parquet(tmp_path)
        fresh.write.mode("overwrite").parquet(state_path)
        live = fresh
        if op_col is not None:
            live = live.filter(F.col(op_col) != F.lit(DELETE_OP))
        agg = live.groupBy(*[F.col(g) for g in group_cols]).agg(
            F.count(F.lit(1)).alias(count_alias)
        )
        if sink is not None:
            sink(agg, batch_id)

    writer = (
        stream.writeStream.foreachBatch(process)
        .outputMode("update")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir or os.path.join(state_dir, "checkpoint"))
    )
    return writer.start()

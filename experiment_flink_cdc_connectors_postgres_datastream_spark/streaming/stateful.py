"""Custom stateful streaming operators on ``applyInPandasWithState``.

This is the Spark mapping SURVEY §2 names for the reference's keyed
stateful processing (KeyedProcessFunction over a keyed stream,
StreamingJobWithCustomDeserializer.java:83,204-218; changelog-correct
COUNT, SJCD:194): arbitrary per-key state with Arrow-batched user
logic, checkpointed by the engine like any streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # pyspark >= 3.4
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    HAS_GROUP_STATE = True
except ImportError:  # pragma: no cover
    HAS_GROUP_STATE = False


def live_count_with_state(
    flat: DataFrame,
    group_col: str = "schema",
    key_col: str = "key",
    seq_cols: tuple[str, ...] = ("ts_ms", "lsn"),
    op_col: str = "op",
    count_alias: str = "user_count",
) -> DataFrame:
    """Changelog-correct streaming GROUP BY COUNT as a CUSTOM STATEFUL
    OPERATOR: per group, the state is a last-write-wins register per
    key — ``(seq, live?)`` — and the emitted count is the number of
    live keys. An event applies only if its ``seq_cols`` tuple is
    newer than the key's stored seq, so the operator is correct under
    ARBITRARY delivery order across micro-batches (file-stream
    reorder, bus partition interleave, checkpoint replay): an update
    cannot double-count, a delete genuinely decrements, and a LATE
    insert older than a tombstone cannot resurrect the key — the
    cases a naive streaming ``dropDuplicates + count`` gets wrong.
    This is exactly the latest-per-key semantics of the batch
    ``count_live_by`` (the driver grades the equivalence).

    State-scale honesty: ONE state row per group holding its key
    registers — the right shape when groups are few and per-group key
    cardinality is bounded (the reference counts users per pg-schema:
    2 groups). For unbounded cardinality use
    ``streaming.run_compacted_aggregate`` (generational state store
    keyed by the PK), the same trade Flink makes between per-key
    ValueState and per-group aggregates. Tombstones are retained
    forever here; production would GC them past the source's replay
    horizon (watermark), like Kafka compaction's delete retention.
    """
    if not HAS_GROUP_STATE:  # pragma: no cover
        raise ImportError("applyInPandasWithState requires pyspark >= 3.4")

    seq = list(seq_cols)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            keys, seqs, live = state.get
            reg = {k: (tuple(s), bool(lv)) for k, s, lv in zip(keys, seqs, live)}
        else:
            reg = {}
        for pdf in pdfs:
            for row in pdf[[key_col, op_col, *seq]].itertuples(index=False):
                k, op = row[0], row[1]
                s = tuple(int(v) for v in row[2:])
                if k not in reg or s > reg[k][0]:
                    reg[k] = (s, op != "d")
        state.update(
            (
                list(reg.keys()),
                [list(s) for s, _ in reg.values()],
                [lv for _, lv in reg.values()],
            )
        )
        n = sum(1 for _, lv in reg.values() if lv)
        yield pd.DataFrame({group_col: [key[0]], count_alias: [n]})

    return flat.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=f"{group_col} string, {count_alias} long",
        stateStructType="keys array<string>, seqs array<array<long>>, live array<boolean>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

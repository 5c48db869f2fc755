"""Multi-sink routing (T6): one parsed CDC stream demuxed to N sinks
in a single pass.

The reference uses a KeyedProcessFunction with side outputs
(MyProcessFunction, StreamingJobWithCustomDeserializer.java:204-218;
OutputTags :36-39) so the source is read once. Spark's N independent
``writeStream``s would each re-read the source, so the engine's
equivalent is ONE ``foreachBatch`` that persists the micro-batch and
routes slices to every sink — same read-once guarantee plus
cross-sink batch consistency.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def route_foreach_batch(
    stream: DataFrame,
    routes: dict[str, tuple[Callable[[DataFrame], DataFrame], Callable[[DataFrame, int], None]]],
    checkpoint_dir: str,
    query_name: str = "multi_sink_router",
):
    """Start one streaming query that fans out each micro-batch.

    ``routes``: sink name → (branch transform, sink fn). The batch is
    persisted once; every branch filters/transforms the cached batch
    and hands it to its sink (console/parquet/JDBC-upsert/…).
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for _name, (transform, sink) in routes.items():
                sink(transform(batch), batch_id)
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )

from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming.stateful import live_count_with_state
from experiment_flink_cdc_connectors_postgres_datastream_spark.streaming.compaction import (
    stream_compact_latest,
    run_compacted_aggregate,
)

__all__ = ["stream_compact_latest", "run_compacted_aggregate", "live_count_with_state"]

from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.envelope import (
    SOURCE_SCHEMA,
    envelope_schema,
    parse_cdc,
    project_flat,
    demux,
    with_key,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.cdc.changelog import (
    compact_latest,
    count_live_by,
    agg_live_by,
    changelog_diff,
    resolve_unavailable,
)

__all__ = [
    "SOURCE_SCHEMA",
    "envelope_schema",
    "parse_cdc",
    "project_flat",
    "demux",
    "with_key",
    "compact_latest",
    "count_live_by",
    "agg_live_by",
    "changelog_diff",
    "resolve_unavailable",
]

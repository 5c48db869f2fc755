from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks.jdbc_upsert import (
    JdbcUpsertSink,
    ParquetUpsertSink,
    build_upsert_sql,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.sinks.routing import route_foreach_batch

__all__ = ["JdbcUpsertSink", "ParquetUpsertSink", "build_upsert_sql", "route_foreach_batch"]

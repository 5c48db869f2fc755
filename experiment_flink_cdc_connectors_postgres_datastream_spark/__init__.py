"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC pipeline
(``ypt/experiment-flink-cdc-connectors-postgres-datastream``).

Spark-first design: the engine is a thin, typed PySpark library —
a CDC data model (envelope parse/project/demux), a changelog algebra
(latest-per-key compaction, changelog-correct aggregates), sources and
sinks (Postgres CDC via the Python DataSource API, JDBC upsert,
multi-sink routing), and large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is declared through the DataFrame API so Catalyst handles
column pruning, predicate pushdown and join planning; Python UDFs are
avoided in hot paths (higher-order functions and hash builtins run
JVM-side).
"""

from experiment_flink_cdc_connectors_postgres_datastream_spark.session import configure_session, get_session

__all__ = ["configure_session", "get_session"]

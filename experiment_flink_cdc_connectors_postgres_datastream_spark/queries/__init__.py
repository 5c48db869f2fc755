"""Named query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 (and the §7.4 extensions) gets one
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. Column
names/aliases are contractually identical between the two.
"""

from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.registry import QUERIES, ORACLES, register
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import reference_surface  # noqa: F401  (registers on import)
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import relational  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import tpch_suite  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import text_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import dedup_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import similarity_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import multimodal_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import windows_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import advanced_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import analytics_ops  # noqa: F401
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import window_functions  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "register"]

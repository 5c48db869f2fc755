from experiment_flink_cdc_connectors_postgres_datastream_spark.plans.explain import (
    formatted_plan,
    pushed_filters,
    scan_columns,
    assert_plan,
)

__all__ = ["formatted_plan", "pushed_filters", "scan_columns", "assert_plan"]

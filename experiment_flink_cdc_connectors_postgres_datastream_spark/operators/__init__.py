from experiment_flink_cdc_connectors_postgres_datastream_spark.operators import text, dedup, similarity, multimodal  # noqa: F401

"""Named queries registered into cdc_kafka_project_spark.registry."""

from cherry_pipelines_spark.sinks.parquet import ParquetSink  # noqa: F401

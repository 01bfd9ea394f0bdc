from cherry_pipelines_spark.sources.parquet import ParquetSource, TableSpec  # noqa: F401

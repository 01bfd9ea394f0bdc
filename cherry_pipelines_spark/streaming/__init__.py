from cherry_pipelines_spark.streaming.incremental import (  # noqa: F401
    StreamingPipeline,
    follow,
)

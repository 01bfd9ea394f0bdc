from cherry_pipelines_spark.engine.step import (  # noqa: F401
    CastStep,
    PyStep,
    SetChainIdStep,
    SqlStep,
    Step,
)
from cherry_pipelines_spark.engine.pipeline import Pipeline, PipelineContext  # noqa: F401
from cherry_pipelines_spark.engine.checkpoint import get_min_block, get_next_block  # noqa: F401

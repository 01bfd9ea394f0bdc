from cherry_pipelines_spark.operators.positional import with_positional_index  # noqa: F401
from cherry_pipelines_spark.operators.windows import trailing_range_agg  # noqa: F401

from cherry_pipelines_spark.plans.explain import (  # noqa: F401
    assert_plan,
    explain_str,
    plan_summary,
)

"""Plan inspection helpers (SURVEY §4).

The engine needs no custom Catalyst rules (SURVEY §4 conclusion) — its
"optimizer layer" is *discipline*: express operators so Catalyst keeps
filters/projections at the scan, picks broadcast for dims, and never
falls into nested-loop joins.  These helpers make that discipline
checkable: tests assert plan properties, and operators can be audited
interactively (``plan_summary(df)``) while tuning.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

# markers that should never appear in a scale-clean plan
DEFAULT_FORBIDDEN = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",  # row-at-a-time Python UDF
)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Node counts that matter for scale review, parsed from the
    formatted explain's detail headers (``(N) NodeName``) so each
    physical node counts exactly once."""
    import re

    plan = explain_str(df)
    counts: dict[str, int] = {}
    for m in re.finditer(r"^\(\d+\) ([A-Za-z]+)", plan, re.M):
        name = m.group(1)
        counts[name] = counts.get(name, 0) + 1
    return counts


def assert_plan(
    df: DataFrame,
    contains: tuple[str, ...] = (),
    forbids: tuple[str, ...] = DEFAULT_FORBIDDEN,
) -> str:
    """Assert plan properties; returns the plan text for further checks."""
    plan = explain_str(df)
    for marker in contains:
        assert marker in plan, f"plan missing {marker!r}:\n{plan}"
    for marker in forbids:
        assert marker not in plan, f"plan contains forbidden {marker!r}:\n{plan}"
    return plan

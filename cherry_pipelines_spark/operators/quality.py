"""Declarative data-contract validation.

A curation pipeline gates every ingest/transform boundary on a schema
contract: required fields present, values in range, strings matching a
shape.  Expressing the checks as named boolean Columns keeps the whole
validation a single map-only pass that Catalyst folds into the scan —
no per-rule jobs, no driver-side row inspection.

NULL posture: a rule whose condition evaluates to NULL (e.g. ``c > 0``
on a NULL ``c``) counts as a VIOLATION — contracts are allowlists, and
SQL's CHECK-constraint leniency (NULL passes) is exactly how nulls
sneak through ingest gates.  Spell nullable-tolerant rules explicitly
(``c.isNull() | (c > 0)``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_violations(
    df: DataFrame,
    rules: Mapping[str, Column],
    id_cols: Sequence[str],
) -> DataFrame:
    """Long-form violation rows ``(*id_cols, rule)`` — one row per
    (row, failed rule).  One map-only pass: each row builds the array
    of its failed rule names (a when-chain per rule, names in sorted
    order) and explodes only the failures; clean rows emit nothing, so
    output volume is proportional to violations, not corpus × rules."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(F.coalesce(cond, F.lit(False)), F.lit(None).cast("string"))
                .otherwise(F.lit(name))
                for name, cond in sorted(rules.items())
            ]
        )
    )
    return df.select(*id_cols, F.explode(failed).alias("rule"))


def contract_report(
    df: DataFrame,
    rules: Mapping[str, Column],
) -> DataFrame:
    """Per-rule violation counts ``(rule, n_violations, n_rows)`` in
    ONE aggregation pass (every rule's conditional count in the same
    agg — partial-merged map-side, one 1-row result), unpivoted with
    ``stack`` like :func:`stats.profile_table`.  The gate a pipeline
    actually branches on (fail the batch if any count > 0) without
    materializing per-row violations."""
    names = sorted(rules)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
        F.sum(
            F.when(F.coalesce(rules[name], F.lit(False)), 0).otherwise(1)
        )
        .cast("long")
        .alias(f"_v_{i}")
        for i, name in enumerate(names)
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', _v_{i}" for i, name in enumerate(names))
    return one.select(
        F.expr(f"stack({len(names)}, {pairs}) as (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    )

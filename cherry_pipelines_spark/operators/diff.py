"""Dataset snapshot diff — the release-audit operator.

Before shipping a regenerated training table (new dedup thresholds, a
refreshed crawl, an upstream decoder fix) the pipeline needs to answer
"what actually changed vs the last release?" at row granularity:
which keys appeared, which vanished, which rows changed in place — and
in which columns.  At 100 TB this must be one co-partitioned join, not
a row-by-row comparison script.

Plan shape: both snapshots shuffle once on the key (a full outer join
Catalyst can run sort-merge on co-bucketed tables with zero exchange),
the value comparison is a JVM-side hash of the compared columns, and
the changed-column list is computed only for rows that already proved
unequal.  Output is row-level; pair it with a groupBy("status") rollup
for the release report.

Reference parity: the reference engine has no diff/audit operator;
this extends the data-release toolbox beyond reference scope.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns one row per key present in either side:
    ``(*key_cols, status, changed_cols)`` where status is ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` and changed_cols is the
    sorted array of differing column names (empty unless changed).
    Comparison is null-safe (NULL == NULL for diff purposes).

    ``compare_cols`` defaults to every shared non-key column.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp = list(compare_cols)

    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cmp],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cmp],
    )
    j = o.join(n, keys, "full_outer")
    neq = [(~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))) for c in cmp]
    any_neq = F.lit(False)
    for e in neq:
        any_neq = any_neq | e
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_neq, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed = F.when(
        status == "changed",
        F.sort_array(
            F.filter(
                F.array(
                    *[F.when(e, F.lit(c)) for c, e in zip(cmp, neq)]
                ),
                lambda x: x.isNotNull(),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return j.select(*keys, status.alias("status"), changed.alias("changed_cols"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """Collapse a ``table_diff`` result to the release report:
    one row per status with its row count."""
    return diff.groupBy("status").agg(F.count("*").cast("long").alias("n"))

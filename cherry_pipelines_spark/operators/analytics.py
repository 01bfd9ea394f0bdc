"""Warehouse-style behavioral analytics: SCD2 history, cohort
retention, and sequential funnels.

The reference engine feeds dashboards from materialized swap/transfer
tables (reference ``pipelines/evm/erc20_transfers.py``,
``swap_prices.py``); these operators are the standard analytic shapes a
consumer of those tables runs next.  All three are single-shuffle
window/groupBy compositions:

* ``scd2_intervals`` — one window shuffle on the entity key; change
  detection and validity intervals are two window passes over the SAME
  partitioning (Catalyst plans one Exchange, the second Window reuses
  the sort).
* ``cohort_retention`` — one shuffle to find each user's cohort (a
  window min over user), then one (cohort, offset) groupBy.  The
  user-keyed window and the groupBy are different keys, so two
  exchanges total — the minimum for this computation.
* ``funnel_conversion`` — the strictly-sequential funnel (step N must
  happen AFTER the user's earliest completion of step N-1) is a chain
  of window mins over the SAME user partitioning: one Exchange, K
  window passes, no self-joins — the classic O(K) formulation that
  avoids the K-way self-join a naive funnel query does.

At 100 TB: everything is keyed by user/entity, so the shuffles are the
unavoidable hash partitionings; no broadcast of big sides, no
driver-side state, skew bounded by per-user event counts (a bot user
with millions of events would need the usual salting treatment
upstream; see operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Collapse an observation log into SCD-type-2 validity intervals.

    Input: one row per observation ``(key, attrs..., ts)``.  Output:
    one row per (key, attr-state) RUN — consecutive observations with
    identical attributes merge — with ``valid_from`` (first ts of the
    run) and ``valid_to`` (start of the next run, NULL while current).

    Ties on ``ts`` are broken by the attribute values themselves so the
    run boundaries are deterministic under any input order.  Two window
    passes over one ``partitionBy(key)`` sort: Catalyst plans a single
    Exchange + Sort, both Windows reuse it.
    """
    attrs = [F.col(c) for c in attr_cols]
    order = [F.col(ts_col)] + attrs
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        # NULL-safe change test: <=> is true when both NULL
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(F.col(ts_col)).over(w).isNull()
    runs = df.select(
        key_col, *attr_cols, ts_col, (first | changed).alias("_is_start")
    ).filter(F.col("_is_start"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return runs.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Cohort × offset retention counts.

    Each user's cohort is the ``bucket``-truncated timestamp of their
    first event; every (user, active-bucket) pair contributes to cell
    ``(cohort, offset)`` where offset counts buckets since the cohort.
    Output: ``(cohort, bucket_offset, n_users)`` with distinct users.

    Plan: window min over user (one hash shuffle on user), then a
    distinct-aggregate groupBy on (cohort, offset) — partial aggs
    map-side, so the second shuffle carries only distinct
    (cohort, offset, user) triples.
    """
    per_bucket = F.date_trunc(bucket, F.col(ts_col))
    w = Window.partitionBy(user_col)
    cohort = F.min(per_bucket).over(w)
    unit = {"day": 86400, "week": 7 * 86400}.get(bucket)
    if unit is None:
        raise ValueError(f"unsupported bucket {bucket!r} (use day|week)")
    offset = (
        (F.unix_timestamp(per_bucket) - F.unix_timestamp(cohort)) / F.lit(unit)
    ).cast("long")
    return (
        df.select(
            F.col(user_col),
            cohort.alias("cohort"),
            offset.alias("bucket_offset"),
        )
        .groupBy("cohort", "bucket_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    step_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Strictly-sequential funnel: how many users completed step k
    AFTER their earliest completion of step k-1 (for every prefix).

    Returns ``(step_index, step, n_users)`` where ``n_users`` is the
    count of users whose sequential completion time for that step is
    non-NULL.  Monotone by construction.

    The completion times are a chain of conditional window mins over
    ONE ``partitionBy(user)``: t1 = min(ts | step=s1), tk = min(ts |
    step=sk AND ts > t(k-1)).  No self-joins; one Exchange feeds all K
    window passes.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    # each t_k must be materialized before t_{k+1} can reference it
    # (window functions cannot nest); the chained selects all share the
    # same partitionBy(user), so Catalyst plans ONE Exchange feeding a
    # stack of Window nodes
    cur = df
    for i, s in enumerate(steps):
        cond = F.col(step_col) == F.lit(s)
        if i > 0:
            cond = cond & (F.col(ts_col) > F.col(f"_t{i - 1}"))
        cur = cur.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
    per_user = cur.groupBy(user_col).agg(
        *[F.min(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"_t{i}")).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.step_index", "r.step", "r.n_users"
    )

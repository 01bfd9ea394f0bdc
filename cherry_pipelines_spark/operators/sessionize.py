"""Event sessionization — gaps-and-islands per key.

A training-data / clickstream staple the reference's event tables feed
into (events → per-user sessions → session-level features).  Two forms:

* :func:`sessionize` — batch gaps-and-islands: ``lag`` + running sum
  over a per-key window.  One shuffle on the key; window state is a
  single previous row, so a partition is bounded by one key's history.
  Semantics: a new session starts when ``ts - prev_ts > gap`` (strict),
  matching the classic SQL formulation so a DuckDB oracle is exact.
* :func:`session_stats` — per-session aggregates over the labeled rows.

For streaming, use ``streaming/windows.session_window_agg`` (Spark's
native ``session_window``, same merge semantics, watermark-driven state
eviction) — the batch form here is the oracle-checkable reference.

Scale notes: the window carries O(1) state per row (lag + running sum),
so the only cost is the hash shuffle on ``key_cols``.  A pathological
single key holding a large fraction of all rows would bottleneck one
task — the standard mitigation is pre-splitting such keys by coarse
time range (the session ids then need a cross-chunk merge pass); not
wired here because session keys (users, devices) are naturally
high-cardinality.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: int,
    order_cols: Sequence[str] = (),
    out_col: str = "session_idx",
) -> DataFrame:
    """Label each row with a 0-based per-key session index.

    ``gap`` is in the units of ``ts_col`` (pass epoch-seconds/nanos
    consistently).  ``order_cols`` breaks ts ties deterministically.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    ts = F.col(ts_col).cast("long")
    is_new = F.when(
        ts - F.lag(ts).over(w) > F.lit(gap), F.lit(1)
    ).otherwise(F.lit(0))  # first row per key: lag NULL -> otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(is_new).over(run).cast("long"))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: int,
    aggs: dict[str, Column] | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Sessionize then aggregate one row per (key, session): start/end
    timestamps, row count, plus any extra ``aggs``."""
    labeled = sessionize(df, key_cols, ts_col, gap, order_cols)
    base = [
        F.min(F.col(ts_col)).alias("session_start"),
        F.max(F.col(ts_col)).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ]
    extra = [expr.alias(name) for name, expr in (aggs or {}).items()]
    return labeled.groupBy(*key_cols, "session_idx").agg(*base, *extra)

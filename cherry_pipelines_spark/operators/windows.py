"""Trailing-range window aggregation (SURVEY §2.3 J5 / §4.9).

The reference computes 20-slot trailing VWAP windows as a non-equi
range *self-join* followed by group-by
(/root/reference/src/cherry_pipelines/svm/swap_prices.py:190-201):
``join_where(right.block_slot >= left.block_slot - 20 AND
right.block_slot <= left.block_slot)`` then ``group_by(...).agg(sum)``.

A literal translation would plan a BroadcastNestedLoopJoin with
quadratic fan-out.  The Spark-first form is a window aggregate:
``Window.partitionBy(keys).orderBy(range_col).rangeBetween(-width, 0)``
— one shuffle on the partition keys, O(n log n), no fan-out, and the
same results row-for-row.  This is a deliberate semantic-preserving
plan improvement over the reference (SURVEY §4.9).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def trailing_range_agg(
    df: DataFrame,
    range_col: str,
    width: int,
    aggs: dict[str, Column],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Append trailing-window aggregate columns.

    ``aggs`` maps output column name → aggregate expression (e.g.
    ``{"total_input": F.sum("input_amount")}``); each is evaluated over
    ``[range_col - width, range_col]`` within ``partition_cols``.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(range_col).cast("long"))
        .rangeBetween(-width, 0)
    )
    # all aggregates in ONE select → one Window node (one sort pass); a
    # withColumn-per-agg loop plans a separate Sort+Window per aggregate
    # because the interleaved Projects block Catalyst's CollapseWindow
    return df.select("*", *[expr.over(w).alias(name) for name, expr in aggs.items()])


def chunked_trailing_range_agg(
    df: DataFrame,
    range_col: str,
    width: int,
    aggs: dict[str, Column],
    partition_cols: Sequence[str] = (),
    chunk: int = 4096,
) -> DataFrame:
    """Scalable variant of :func:`trailing_range_agg` for unbounded /
    low-key-cardinality inputs.

    ``Window.partitionBy()`` (or a handful of hot keys) funnels ALL rows
    of a key into one task — fine for a 200-slot batch, a single-task
    bottleneck over full history.  Here rows are hashed into
    ``chunk``-wide range chunks of ``range_col``; rows within ``width``
    of a chunk's end are additionally replicated into the next chunk as
    lookback-only feeders, so every row still sees its full
    ``[value-width, value]`` trailing window while no window partition
    exceeds ``chunk + width`` range units.  Cost: ~``width/chunk`` row
    duplication (default <0.5%) and one extra union — the same
    bucket-expansion trick as ``operators/ranges.interval_join``.

    Requires ``width <= chunk`` (a window never spans more than two
    chunks) and non-negative aggregate inputs are NOT required — results
    are exact, row-for-row equal to the unchunked form.
    """
    if width > chunk:
        raise ValueError(f"chunk ({chunk}) must be >= width ({width})")
    v = F.col(range_col).cast("long")
    native = df.withColumn("_w_chunk", F.floor(v / chunk)).withColumn(
        "_w_feeder", F.lit(False)
    )
    spill = (
        df.filter(F.pmod(v, F.lit(chunk)) >= chunk - width)
        .withColumn("_w_chunk", F.floor(v / chunk) + 1)
        .withColumn("_w_feeder", F.lit(True))
    )
    both = native.unionByName(spill)
    w = (
        Window.partitionBy(*partition_cols, "_w_chunk")
        .orderBy(v)
        .rangeBetween(-width, 0)
    )
    out = both.select("*", *[expr.over(w).alias(name) for name, expr in aggs.items()])
    return out.filter(~F.col("_w_feeder")).drop("_w_chunk", "_w_feeder")


def ewma(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.2,
    lookback: int = 32,
    partition_cols: Sequence[str] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key:
    ``y_t = alpha * sum_{j=0..K-1} (1-alpha)^j * x_{t-j}`` over the last
    ``lookback`` rows — the smoothing curve behind rate monitors, drift
    detectors, and per-source quality trendlines.

    The textbook recurrence ``y_t = a*x_t + (1-a)*y_{t-1}`` is
    sequential; the closed form over an unbounded prefix needs
    ``(1-a)^{-t}`` scaling that overflows doubles.  The truncated form
    is exact over its window, the dropped tail is bounded by
    ``(1-alpha)^lookback`` (default 0.8^32 ≈ 8e-4 of total weight),
    and it is expressible as pure JVM window + higher-order-function
    work: ``collect_list`` over a rows-frame, reverse, weight by
    ``pow(1-alpha, j)``, sum — one keyed shuffle, no UDF, no
    sequential scan.  Weight order is a literal array fold, so the
    float sum is deterministic."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(lookback - 1), 0)
    )
    lst = F.reverse(F.collect_list(F.col(value_col).cast("double")).over(w))
    weighted = F.zip_with(
        lst,
        F.transform(
            F.sequence(F.lit(0), F.size(lst) - 1),
            lambda j: F.pow(F.lit(1.0 - alpha), j.cast("double")),
        ),
        lambda x, wt: x * wt,
    )
    val = F.lit(float(alpha)) * F.aggregate(
        weighted, F.lit(0.0), lambda acc, x: acc + x
    )
    return df.withColumn(out_col, val)


def last_touch_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    type_col: str = "event_type",
    touch_types: Sequence[str] = ("click", "view"),
    conversion_type: str = "purchase",
    carry_cols: Sequence[str] = ("event_id", "ts"),
) -> DataFrame:
    """Attribute each conversion event to the user's most recent
    preceding touch event (last-touch attribution) — the event-stream
    join every product-analytics pipeline runs, expressed WITHOUT a
    self-join: ``last(touch, ignorenulls=True)`` over an
    unbounded-preceding rows frame carries the latest touch forward,
    then a filter keeps conversions.  One keyed shuffle on the user;
    the stream is scanned once.  Conversions with no prior touch
    surface with NULL attribution (kept — they are the organic
    bucket)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_touch = F.col(type_col).isin(*touch_types)
    out = df
    for c in carry_cols:
        out = out.withColumn(
            f"touch_{c}",
            F.last(F.when(is_touch, F.col(c)), ignorenulls=True).over(w),
        )
    return out.filter(F.col(type_col) == conversion_type)


def debounce(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    gap_col: str,
    window: int,
) -> DataFrame:
    """Burst deduplication ("debounce"): within each key, keep only the
    FIRST event of every burst — a run of events each within ``window``
    units (of ``gap_col``, e.g. epoch seconds) of its predecessor.
    The event-pipeline hygiene op for double-clicks, retry storms, and
    at-least-once duplicate deliveries.

    Gaps-and-islands without the island id: one ``lag`` over one keyed
    window; a row survives iff it has no predecessor or trails it by
    more than ``window``.  One shuffle, no join, no state."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.col(gap_col)).over(w)
    return df.withColumn("_prev", prev).filter(
        F.col("_prev").isNull() | (F.col(gap_col) - F.col("_prev") > window)
    ).drop("_prev")


def quantile_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "qnorm",
    scale: int = 6,
) -> DataFrame:
    """Within-group percentile rank of ``value_col`` (percent_rank ∈
    [0, 1], rounded) — the cross-source score calibration step: raw
    quality scores from different sources/models live on different
    scales, their per-source quantiles are comparable.

    One keyed window per group (partitioned — never a global total
    order, which would funnel the corpus through one task).  Ties get
    equal rank (percent_rank semantics), single-row groups get 0."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), scale))

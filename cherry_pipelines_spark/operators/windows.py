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

"""Time-series primitives: grid resampling with forward-fill, and a
distributed global running sum.

These are the hypertable operations (reference-adjacent: the
reference's windowed batch pipelines roll derived tables forward in
block ranges; an analytics consumer of those tables wants them on a
regular time grid and wants cumulative curves) expressed in shapes
that survive 100 TB:

* ``resample_ffill`` builds each key's grid IN-PLAN (min/max agg +
  ``sequence`` explode — no driver collect, no per-key loop) and
  forward-fills by unioning grid and data rows into ONE keyed window
  with ``last(ignorenulls)`` — the as-of join against the grid without
  a join.
* ``chunked_running_sum`` computes a GLOBAL cumulative sum without the
  classic scale-killer (``Window.orderBy`` with no partition funnels
  the corpus through one task).  Rows are range-chunked; each chunk
  scans locally after one keyed shuffle; chunk offsets are an
  exclusive prefix over the (tiny) per-chunk totals; totals join back
  by chunk id.  Sums run in decimal, so the split into chunks cannot
  change the answer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Resample each key's series onto a ``step``-spaced grid (aligned
    to multiples of ``step``, spanning that key's [min, max]) with
    forward-fill: every grid point carries the latest value at-or-
    before it.  Grid points before a key's first observation stay NULL
    (explicitly: no back-fill).

    Returns ``(*key_cols, grid_ts, value)``.

    One aggregation for the per-key bounds, one explode for the grid,
    one keyed window for the fill — the grid is never materialized on
    the driver and there is no join against the data."""
    keys = list(key_cols)
    bounds = df.groupBy(*keys).agg(
        F.floor(F.min(ts_col) / step).alias("_lo"),
        F.floor(F.max(ts_col) / step).alias("_hi"),
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_slot"),
    ).select(
        *keys,
        (F.col("_slot") * step).cast("long").alias("_t"),
        F.lit(None).cast(dict(df.dtypes)[value_col]).alias("_v"),
        F.lit(1).alias("_is_grid"),
        *[F.lit(None).cast(dict(df.dtypes)[c]).alias(c) for c in order_tiebreak],
    )
    data = df.select(
        *keys,
        F.col(ts_col).cast("long").alias("_t"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_is_grid"),
        *order_tiebreak,
    )
    # data rows sort BEFORE the grid row at the same instant, so a grid
    # point lands on the value AT its own timestamp; ties among data
    # rows break on the caller's columns (grid rows carry NULLs there —
    # asc_nulls_last keeps the cross-engine order unambiguous)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("_t").asc(),
            F.col("_is_grid").asc(),
            *[F.col(c).asc_nulls_last() for c in order_tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = data.unionByName(grid).withColumn(
        "value", F.last(F.col("_v"), ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_grid") == 1).select(
        *keys, F.col("_t").alias("grid_ts"), "value"
    )


def chunked_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    order_tiebreak: Sequence[str] = (),
    chunk: int = 86_400,
    out_col: str = "running_sum",
) -> DataFrame:
    """Global cumulative sum of ``value_col`` in ``order_col`` order
    (ties broken by ``order_tiebreak``) — the distributed prefix scan.

    ``Window.orderBy`` without a partition is the textbook scale
    mistake (every row through one task).  Here: rows hash-shuffle
    ONCE on their range chunk ``floor(order/chunk)``; the within-chunk
    scan is an ordinary partitioned window; the cross-chunk carry is
    an exclusive prefix over per-chunk totals — |chunks| rows, small
    by construction — joined back by chunk id.  Decimal(38,6) sums
    end-to-end: chunk splits cannot perturb the result."""
    v = F.col(value_col).cast("decimal(38,6)")
    base = df.withColumn("_chunk", F.floor(F.col(order_col) / chunk))
    w_in = (
        Window.partitionBy("_chunk")
        .orderBy(F.col(order_col), *[F.col(t) for t in order_tiebreak])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = base.withColumn("_local", F.sum(v).over(w_in))
    totals = base.groupBy("_chunk").agg(F.sum(v).alias("_total"))
    # constant partition key: the carry frame is |chunks| rows, small by
    # construction — one partition is the intent, and the explicit key
    # keeps WindowExec's no-partition warning out of executor logs
    w_chunks = (
        Window.partitionBy(F.lit(0))
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_chunk",
        F.coalesce(
            F.sum("_total").over(w_chunks), F.lit(0).cast("decimal(38,6)")
        ).alias("_offset"),
    )
    return (
        within.join(F.broadcast(offsets), "_chunk")
        .withColumn(out_col, (F.col("_local") + F.col("_offset")).cast("decimal(38,6)"))
        .drop("_chunk", "_local", "_offset")
    )

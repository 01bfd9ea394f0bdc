"""Interval (range) join: match points to the intervals containing them.

Spark has no native interval join: ``points.join(intervals,
(p >= start) & (p <= end))`` plans as BroadcastNestedLoopJoin —
O(n·m) and a driver OOM once the broadcast side grows.  This is the
standard gap hit by time-range enrichment, IP→geo lookups, and genomic
overlap queries (the reference's only non-equi join, SURVEY §2.3 J5,
is the special case "interval = trailing window of self", rewritten as
a range-frame window in ``swap_prices``; this operator is the general
two-table form).

Scale shape — bucket expansion turns the theta join into an equi join:

1. pick a ``bucket_width`` (≈ the typical interval length);
2. each interval explodes to the buckets it overlaps
   (``sequence(floor(start/w), floor(end/w))``) — expansion factor
   ≈ 1 + len/w, so ~2 at the recommended width;
3. each point maps to exactly one bucket (``floor(p/w)``);
4. equi-join on the bucket id, then post-filter the exact
   ``start <= p <= end`` predicate.

One shuffle on uniform bucket keys (both sides hash-partitioned), no
nested loop, no broadcast of an unbounded side; a pathologically long
interval costs ``len/w`` duplicate rows, not a hot partition.  AQE
skew-join splits any residual hot bucket.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "_iv_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (closed bounds, matching SQL
    BETWEEN).  Column names must be disjoint between the two inputs.
    ``how`` is ``inner`` or ``left`` (unmatched points survive with NULL
    interval columns; left mode identifies points by their full row, so
    point rows should be distinct — carry a unique id column if not).

    ``bucket_width`` trades shuffle volume for fan-out: use roughly the
    median interval length (expansion factor ≈ 1 + len/width per
    interval).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def _b(c: Column) -> Column:
        return F.floor(c.cast("long") / F.lit(bucket_width)).cast("long")

    pb = points.withColumn(_BUCKET, _b(F.col(point_col)))
    ib = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(_b(F.col(start_col)), _b(F.col(end_col)))),
    )
    matched = (
        pb.join(ib, _BUCKET, "inner")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop(_BUCKET)
    )
    if how == "inner":
        return matched
    # left: re-attach unmatched points with NULL interval columns.  The
    # anti-join must use null-safe equality — with plain ``=`` a matched
    # point row containing a NULL never equals itself, so it would be
    # emitted twice (once matched, once as a spurious unmatched row).
    m = matched.select(
        *[F.col(c).alias(f"_m_{c}") for c in points.columns]
    ).distinct()
    cond = reduce(
        and_,
        [F.col(c).eqNullSafe(F.col(f"_m_{c}")) for c in points.columns],
    )
    unmatched = points.join(m, cond, "left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(unmatched)


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join (range × range): every pair with
    ``left_start <= right_end AND right_start <= left_end`` (closed
    bounds) — the genomic/temporal overlap query Spark would otherwise
    plan as a nested loop.

    Same bucket-expansion shape as :func:`interval_join`, applied to
    BOTH sides.  A pair whose intervals share several buckets would
    match once per shared bucket; instead of a distinct (an extra
    shuffle over the full result), each pair is emitted only in its
    canonical bucket — the first bucket where both intervals exist,
    ``greatest(floor(l_start/w), floor(r_start/w))`` — which is
    guaranteed to be a shared bucket of every overlapping pair.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def _b(c: str) -> Column:
        return F.floor(F.col(c).cast("long") / F.lit(bucket_width)).cast("long")

    lb = left.withColumn(_BUCKET, F.explode(F.sequence(_b(left_start), _b(left_end))))
    rb = right.withColumn(_BUCKET, F.explode(F.sequence(_b(right_start), _b(right_end))))
    matched = (
        lb.join(rb, _BUCKET, "inner")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col(_BUCKET) == F.greatest(_b(left_start), _b(right_start)))
        )
        .drop(_BUCKET)
    )
    if how == "inner":
        return matched
    m = matched.select(
        *[F.col(c).alias(f"_m_{c}") for c in left.columns]
    ).distinct()
    cond = reduce(
        and_,
        [F.col(c).eqNullSafe(F.col(f"_m_{c}")) for c in left.columns],
    )
    unmatched = left.join(m, cond, "left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return matched.unionByName(unmatched)

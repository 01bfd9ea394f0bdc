"""As-of join: match each left row with the latest right row at or
before its timestamp (per key group).

The reference approximates this with its positional adjacency join
(SURVEY §2.3 J2 note: "the positional J2 is the reference's substitute
for an as-of/adjacency join"); a general as-of join is the standard
tool for pricing/event alignment, so the engine carries one.

Plan shape (the part that matters at 100 TB): a naive formulation is a
non-equi range join — O(n·m) nested-loop fan-out.  This implementation
uses the union+window trick instead:

1. union left and right rows into one stream, right rows carrying their
   value columns, left rows carrying NULLs;
2. one shuffle on the ``by`` keys, sort by (ts, side) within groups;
3. ``last_value(..., ignorenulls=True)`` over an unbounded-preceding
   window fills each left row with the most recent right value;
4. keep the left rows.

One exchange + one sort — the same cost as a windowed aggregation,
independent of how many right rows precede each left row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (quotes), 1 = left (events)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    allow_exact_match: bool = True,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gets the ``value_cols``
    of the newest ``right`` row with ``right.ts <= left.ts`` (strict
    ``<`` when ``allow_exact_match=False``) within the same ``by`` keys;
    NULLs when no such row exists.

    ``value_cols`` defaults to all right columns except ``ts_col`` and
    ``by``.  Output: all left columns + the value columns.
    """
    keys = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    value_cols = list(value_cols)
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value columns collide with left columns: {sorted(overlap)}")

    left_cols = list(left.columns)
    l = left.select(
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(1).alias(_SIDE),
    )
    r = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in (*keys, ts_col)
            else F.col(c)
            for c in left_cols
        ],
        *value_cols,
        F.lit(0).alias(_SIDE),
    )
    # with exact matches allowed, a right row at ts must sort BEFORE a
    # left row at the same ts (side 0 < 1); for strict inequality, after
    side_order = F.col(_SIDE).asc() if allow_exact_match else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # fill ONE struct of all value columns per right row, not one
    # independent last() per column: per-column fills would back-fill a
    # NULL in the newest matching row from an older row, stitching the
    # output from different right rows (pandas merge_asof / DuckDB ASOF
    # keep the newest row's NULL — so do we).
    vals = "_asof_vals"
    filled = l.unionByName(r).select(
        *left_cols,
        F.col(_SIDE).alias(_SIDE),
        F.last(
            F.when(F.col(_SIDE) == 0, F.struct(*[F.col(c) for c in value_cols])),
            ignorenulls=True,
        )
        .over(w)
        .alias(vals),
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        *[F.col(vals).getField(c).alias(c) for c in value_cols],
    )

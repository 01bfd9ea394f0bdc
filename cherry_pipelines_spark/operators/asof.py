"""As-of join: match each left row with the nearest right row at/before
(backward), at/after (forward), or closest in either direction
(nearest) of its timestamp, per key group — pandas ``merge_asof``
parity.

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
   window (backward) / ``first_value`` over unbounded-following
   (forward) fills each left row with the nearest right value struct;
4. keep the left rows.

One exchange + one sort per direction — the same cost as a windowed
aggregation, independent of how many right rows precede each left row.
``nearest`` evaluates both fills in the same shuffled partition (a
second in-partition sort, no extra exchange) and picks the closer one,
ties to the backward match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (quotes), 1 = left (events)
_TS = "_asof_ts"  # matched right row's ts, for nearest-distance choice


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    allow_exact_match: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``left`` with ``right`` on ``ts_col`` within ``by``.

    ``direction="backward"``: newest right row with ``right.ts <=
    left.ts``; ``"forward"``: earliest right row with ``right.ts >=
    left.ts``; ``"nearest"``: whichever of the two is closer in absolute
    distance (ties → the backward match).  ``allow_exact_match=False``
    makes each inequality strict.  NULLs when no row qualifies.

    ``value_cols`` defaults to all right columns except ``ts_col`` and
    ``by``.  Output: all left columns + the value columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
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
    combined = l.unionByName(r)
    # the matched row travels as ONE struct (ts + all value columns):
    # per-column fills would back-fill a NULL in the nearest matching
    # row from a farther row, stitching the output from different right
    # rows (pandas merge_asof / DuckDB ASOF keep the matched row's NULL)
    right_struct = F.when(
        F.col(_SIDE) == 0,
        F.struct(F.col(ts_col).cast("long").alias(_TS), *[F.col(c) for c in value_cols]),
    )

    def fill(dir_: str) -> Column:
        if dir_ == "backward":
            # exact match allowed → a right row at the same ts must sort
            # BEFORE the left row (side 0 < 1) so the preceding-window
            # sees it; strict → after
            side_order = F.col(_SIDE).asc() if allow_exact_match else F.col(_SIDE).desc()
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col(ts_col).asc(), side_order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return F.last(right_struct, ignorenulls=True).over(w)
        # forward: mirror image — exact match needs the equal-ts right
        # row AFTER the left row so the following-window sees it
        side_order = F.col(_SIDE).desc() if allow_exact_match else F.col(_SIDE).asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), side_order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        return F.first(right_struct, ignorenulls=True).over(w)

    if direction == "nearest":
        b, f = fill("backward"), fill("forward")
        ts = F.col(ts_col).cast("long")
        chosen = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when((ts - b.getField(_TS)) <= (f.getField(_TS) - ts), b)
            .otherwise(f)
        )
    else:
        chosen = fill(direction)

    vals = "_asof_vals"
    filled = combined.select(
        *left_cols, F.col(_SIDE).alias(_SIDE), chosen.alias(vals)
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        *[F.col(vals).getField(c).alias(c) for c in value_cols],
    )

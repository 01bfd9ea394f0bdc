"""Positional-index assignment for adjacency joins (SURVEY §2.2 P12, §7.3).

The reference sorts the whole instruction batch by ``(block_slot,
transaction_index, instruction_address)`` and assigns a *global* row
index (`with_row_index`, orca_swaps.py:230-238); downstream it joins on
``index + 1`` / ``index + 2`` to pair each swap with the token-transfer
inner instructions immediately after it.

A global index would force a single-partition sort at scale.  Key
insight (SURVEY §7.3): the index is only ever *compared* within one
``(block_slot, transaction_index)`` group — the reference's ``+1/+2``
lookups can never cross a transaction boundary because instruction
adjacency is within a transaction.  So a per-group ``row_number()``
ordered by ``instruction_address`` is semantically identical and
shuffle-friendly: Spark hash-partitions by (slot, tx) and sorts only
within groups.  At 100 TB this is the difference between an impossible
global sort and an ordinary window.

``instruction_address`` is ``array<int>`` — Spark can compare arrays
lexicographically in ``orderBy`` (ArrayType ordering is element-wise),
which matches polars' lexicographic array sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_positional_index(
    df: DataFrame,
    group_cols: Sequence[str] = ("block_slot", "transaction_index"),
    order_cols: Sequence[str] = ("instruction_address",),
    index_col: str = "index",
) -> DataFrame:
    """Append a 0-based per-(slot, tx) positional index.

    IMPORTANT: filter out memo-program / excluded rows *before* calling
    this (the reference filters at orca_swaps.py:234-237 before
    indexing; indexing first would shift adjacency).
    """
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(index_col, F.row_number().over(w) - F.lit(1))

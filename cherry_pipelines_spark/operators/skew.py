"""Skew-aware join: salting for hot keys (SURVEY §4.8 / the 100 TB
design notes).

AQE's skew-join handles most cases at runtime; explicit salting remains
the tool when one side must be *replicated* deterministically — e.g. a
medium-sized dimension too big to broadcast joined against a fact table
whose key distribution is pathological (one token mint, one hot wallet).

``salted_join`` splits every hot fact-side key across ``salt_factor``
sub-keys and replicates the matching dimension rows once per sub-key:
the shuffle then spreads a hot key over ``salt_factor`` reducers
instead of one.  Equivalent rows to a plain equi-join, verified in
tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted.

    The fact side gets a deterministic pseudo-random salt in
    ``[0, salt_factor)`` (hash of the whole row's join keys plus a
    spread column — ``spark_partition_id`` + monotonic id keeps it
    cheap and uniform); the dim side is exploded ×``salt_factor`` so
    every (key, salt) bucket finds its match.  Join keys plus the salt
    become the shuffle key.

    Supported ``how``: inner / left (dim is the replicated side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim replicated)")
    keys = list(on)
    f = fact.withColumn(
        SALT_COL,
        F.pmod(
            F.hash(*keys, F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_factor),
        ),
    )
    d = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return f.join(d, keys + [SALT_COL], how).drop(SALT_COL)

"""Bucketed table layout — the co-located-join storage strategy.

The reference clusters MergeTree tables by ORDER BY key
(/root/reference/src/cherry_pipelines/svm/orca_swaps.py:219) so reads
along that key are sequential.  Spark's equivalent lever for *joins* is
bucketing: two tables bucketed into the same number of buckets on the
join key hash-partition their files at WRITE time, so a later join
reads matching buckets pairwise — no shuffle exchange at all.  At
100 TB that turns every repeated fact-to-fact join on a stable key
(swaps ⨝ prices on mint, events ⨝ profile on user) from a full-cluster
shuffle into a local merge; the shuffle is paid once at write time and
amortized over every downstream join.

Bucketed tables must go through the catalog (``saveAsTable``) — plain
``parquet(path)`` writes don't record bucket metadata.  ``path`` makes
the table external, so the files live with the rest of the sink data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed table (optionally sorted
    within buckets — the ORDER-BY-clustering analogue)."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (required for
    the shuffle-free join — a plain ``spark.read.parquet`` of the same
    files would lose it)."""
    return spark.table(table)

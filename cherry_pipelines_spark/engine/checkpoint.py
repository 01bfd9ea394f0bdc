"""Checkpoint helpers — resume from the sink's max-block high-water mark.

Mirrors the reference's SQL MIN/MAX checkpoint reads
(/root/reference/src/cherry_pipelines/db.py:8-45): the next block to
ingest is ``MAX(block_col) + 1`` over the already-written sink table,
optionally scoped by ``chain_id``.  Here the sink is a Parquet
directory; the max read is a metadata-cheap column scan (Parquet
row-group stats make this fast even on huge sinks, and
``spark.sql.parquet.aggregatePushdown`` turns it into a stats-only
scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_sink(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    return df


def get_next_block(
    spark: SparkSession, sink_path: str, column: str, chain_id: int | None = None
) -> int:
    """Next block to process = MAX(column)+1 over the sink, 0 if empty/missing.

    Reference: db.py:30-45 (returns 0 on failure so a fresh run starts
    from the configured ``from_block``).
    """
    df = _read_sink(spark, sink_path)
    if df is None or column not in df.columns:
        return 0
    if chain_id is not None and "chain_id" in df.columns:
        df = df.filter(F.col("chain_id") == chain_id)
    row = df.agg(F.max(column).alias("m")).collect()[0]
    return 0 if row["m"] is None else int(row["m"]) + 1


def get_min_block(
    spark: SparkSession, sink_path: str, column: str, chain_id: int | None = None
) -> int | None:
    """Earliest available block in a source table (reference: db.py:8-27)."""
    df = _read_sink(spark, sink_path)
    if df is None or column not in df.columns:
        return None
    if chain_id is not None and "chain_id" in df.columns:
        df = df.filter(F.col("chain_id") == chain_id)
    row = df.agg(F.min(column).alias("m")).collect()[0]
    return None if row["m"] is None else int(row["m"])
